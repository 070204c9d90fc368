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

# sanitizer-hardened fuzz of the native runtime (parity surface for the
# reference's clang -fsanitize=address,fuzzer harness, sqoafuzz.c:10,20-32;
# no libFuzzer in this toolchain, so tools/fuzz_native.c is a seeded
# mutation driver). FUZZ_ITERS mutated execs + directed seeds.
FUZZ_ITERS ?= 1000000
fuzz-asan: tools/fuzz_native.c $(NATIVE_SRC)
	$(CC) -O1 -g -std=c11 -fsanitize=address,undefined \
	  -fno-sanitize-recover=all -o /tmp/sqoa_fuzz_asan tools/fuzz_native.c
	/tmp/sqoa_fuzz_asan $(FUZZ_ITERS)

clean:
	rm -f $(NATIVE_LIB) /tmp/libsqoa_refprobe.so
	find . -name __pycache__ -type d -exec rm -rf {} +

.PHONY: all native refprobe test bench fuzz clean
