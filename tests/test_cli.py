"""Tooling-layer tests: converter CLI, bench harness, corpus and fuzz
commands (the reference's L3 layer, sqoaconv.c:38-100 + sqoabench.c:549-684).

Everything runs on the native backend so the module is CPU-only and fast;
the TPU pipeline behind the same commands is covered by the codec suites.
"""

import os

import numpy as np
import pytest

from seqoia_tpu import cli, native
from seqoia_tpu.io import png as pngio


def _write_png(path, w, h, ch, seed=0):
    rng = np.random.default_rng(seed)
    # plateau-ish content so the encode paths see runs as well as deltas
    base = rng.integers(0, 256, (h, 1, ch), dtype=np.uint8)
    pix = np.broadcast_to(base, (h, w, ch)).copy()
    pix[:, w // 2 :, :] = rng.integers(0, 256, (h, w - w // 2, ch),
                                       dtype=np.uint8)
    pngio.write_image(path, pix.reshape(-1), w, h, ch)
    return pix.reshape(-1)


def test_convert_png_sqoa_roundtrip(tmp_path):
    src = str(tmp_path / "in.png")
    mid = str(tmp_path / "mid.sqoa")
    back = str(tmp_path / "out.png")
    pix = _write_png(src, 20, 13, 3)

    assert cli.main(["convert", "--native", src, mid]) == 0
    # the .sqoa really decodes with the oracle to the source pixels
    # (odd-channel input gains an alpha plane at encode, so force RGB out)
    with open(mid, "rb") as f:
        got, desc = native.decode(f.read(), 3)
    w, h = desc[0], desc[1]
    assert (w, h) == (20, 13)
    assert np.array_equal(np.asarray(got), pix)

    assert cli.main(["convert", "--native", mid, back]) == 0
    # the .sqoa carries the alpha plane added at encode, so the png is RGBA
    rt, w, h, ch = pngio.read_image(back)
    assert (w, h, ch) == (20, 13, 4)
    rt = rt.reshape(-1, 4)
    assert np.array_equal(rt[:, :3].reshape(-1), pix)
    assert np.all(rt[:, 3] == 255)


def test_convert_qoi_extension_sets_compat(tmp_path):
    src = str(tmp_path / "in.png")
    out = str(tmp_path / "out.qoi")
    _write_png(src, 16, 16, 4, seed=1)
    assert cli.main(["convert", "--native", src, out]) == 0
    with open(out, "rb") as f:
        data = f.read()
    # compat files carry the qoif magic and no start byte (seqoia.h:677)
    assert data[:4] == b"qoif"
    pix, desc = native.decode(data, 0)
    assert pix is not None and desc[4] == 1  # qoi_compat flag


def test_convert_odd_channels_forced_even(tmp_path):
    # odd-channel png input gains an opaque alpha plane (sqoaconv.c:56-59)
    src = str(tmp_path / "gray.png")
    out = str(tmp_path / "out.sqoa")
    _write_png(src, 9, 7, 1, seed=2)
    assert cli.main(["convert", "--native", src, out]) == 0
    with open(out, "rb") as f:
        _, desc = native.decode(f.read(), 0)
    assert desc[2] == 2  # header channels byte: gray + alpha


def test_convert_jpeg_output(tmp_path):
    pytest.importorskip("PIL")
    src = str(tmp_path / "in.png")
    out = str(tmp_path / "out.jpg")
    _write_png(src, 24, 18, 3, seed=3)
    assert cli.main(["convert", "--native", src, out]) == 0
    pix, w, h, ch = pngio.read_image(out)
    assert (w, h, ch) == (24, 18, 3)


def test_convert_rejects_unknown_extensions(tmp_path):
    src = str(tmp_path / "in.png")
    _write_png(src, 8, 8, 3)
    assert cli.main(["convert", "--native", src, str(tmp_path / "x.gif")]) == 1
    # input rejection is about the extension, not a missing file: the .bmp
    # exists on disk and is still refused
    bmp = str(tmp_path / "x.bmp")
    with open(bmp, "wb") as f:
        f.write(b"BM" + b"\0" * 64)
    assert cli.main(["convert", "--native", bmp, "out.sqoa"]) == 1


def test_bench_harness_directory(tmp_path, capsys):
    d = tmp_path / "suite" / "sub"
    os.makedirs(d)
    for i in range(3):
        _write_png(str(d / f"img_{i}.png"), 12 + i, 10, 3, seed=i)
    rc = cli.main(["bench", "--nopng", str(tmp_path / "suite"), "1"])
    assert rc == 0
    out = capsys.readouterr().out
    # grand-total block in the sqoabench table format, qoi + sqoa rows
    assert "decode mpps" in out and "sqoa" in out and "qoi" in out
    assert "# Grand total" in out


def test_bench_harness_flags(tmp_path, capsys):
    d = tmp_path / "suite"
    os.makedirs(d)
    _write_png(str(d / "img.png"), 10, 10, 4, seed=5)
    rc = cli.main([
        "bench", "--nopng", "--nodecode", "--onlytotals", "--nowarmup",
        str(d), "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# Grand total" in out


def test_corpus_command(tmp_path):
    d = str(tmp_path / "corpus")
    rc = cli.main(["corpus", d, "--scale", "0.05"])
    assert rc == 0
    files = [f for f in os.listdir(d) if f.endswith(".png")]
    assert files, "corpus wrote no images"
    pix, w, h, ch = pngio.read_image(os.path.join(d, files[0]))
    assert pix.size == w * h * ch


def test_fuzz_command_native():
    assert cli.main(["fuzz", "60", "--seed", "7"]) == 0
