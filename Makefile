# seqoia_tpu build/test/bench entry points
# (parity surface for the reference Makefile, reference: Makefile:1-22)

CC ?= cc
NATIVE_SRC = seqoia_tpu/native/sqoa_native.c
NATIVE_LIB = seqoia_tpu/native/libsqoa_native.so

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	$(CC) -O3 -std=c11 -shared -fPIC -Wall -Wextra -o $@ $<

# test-only probe over the upstream reference (skipped if not mounted)
refprobe: tools/refprobe.c
	$(CC) -O3 -std=c11 -shared -fPIC -w -o /tmp/libsqoa_refprobe.so \
	  -DSQOA_REFERENCE_HEADER='"/root/reference/seqoia.h"' tools/refprobe.c

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

fuzz: native
	python -m seqoia_tpu.cli fuzz 2000

clean:
	rm -f $(NATIVE_LIB) /tmp/libsqoa_refprobe.so
	find . -name __pycache__ -type d -exec rm -rf {} +

.PHONY: all native refprobe test bench fuzz clean
