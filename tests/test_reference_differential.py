"""Three-leg differential tests against the compiled REFERENCE binary.

Mirrors the reference's own test strategy (SURVEY.md §4: cross-validation
round trips vs libdeflate, test/libdeflate.cpp:100-173) with the reference
itself as the second oracle:

  leg A: reference-compress (level 3, its only correct level) -> our inflate
  leg B: our compress -> reference-inflate
  leg C: sizes — ours must not exceed the reference's level-3 output

The reference headers are compiled once per session into a tiny CLI.
"""
import os
import subprocess
import zlib

import numpy as np
import pytest

import deflate_tpu

REF = "/root/reference"
BIN = "/tmp/dtref_cli"

CLI_SRC = r"""
// Thin CLI over the reference headers (deflate.hpp:798, inflate.hpp:376):
// argv[1] = deflate|inflate, argv[2] = level (deflate only); stdin->stdout.
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>
#include "deflate.hpp"
#include "inflate.hpp"
int main(int argc, char** argv) {
    (void)argc;
    std::vector<uint8_t> in;
    {
        uint8_t buf[65536];
        size_t n;
        while ((n = fread(buf, 1, sizeof buf, stdin)) > 0)
            in.insert(in.end(), buf, buf + n);
    }
    std::vector<uint8_t> out;
    if (!strcmp(argv[1], "deflate")) {
        out = deflate::compress(in, atoi(argv[2]));
    } else {
        out = inflate::decompress(in);
    }
    fwrite(out.data(), 1, out.size(), stdout);
    return 0;
}
"""


def _build_cli():
    if os.path.exists(BIN):
        return True
    with open("/tmp/dtref_cli.cpp", "w") as f:
        f.write(CLI_SRC)
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}/include",
         "/tmp/dtref_cli.cpp", "-o", BIN],
        capture_output=True, text=True)
    return r.returncode == 0


pytestmark = pytest.mark.skipif(not _build_cli(),
                                reason="reference CLI failed to build")


def ref_deflate(data: bytes, level: int = 3) -> bytes:
    return subprocess.run([BIN, "deflate", str(level)], input=data,
                          capture_output=True, check=True).stdout


def ref_inflate(data: bytes) -> bytes:
    return subprocess.run([BIN, "inflate"], input=data,
                          capture_output=True, check=True).stdout


CORPUS = {
    "tiny.bmp": open(f"{REF}/tiny.bmp", "rb").read(),
    "test.bmp": open(f"{REF}/test.bmp", "rb").read(),
    "text": bytes(np.random.default_rng(0).integers(97, 120, 40000,
                                                    dtype=np.uint8)),
}


@pytest.mark.parametrize(
    "name", ["tiny.bmp", "test.bmp",
             pytest.param("text", marks=pytest.mark.slow)])
def test_leg_a_reference_stream_our_inflate(name):
    data = CORPUS[name]
    stream = ref_deflate(data, 3)
    assert zlib.decompress(stream, -15) == data     # sanity: it's valid
    assert deflate_tpu.decompress(stream) == data
    assert deflate_tpu.decompress(stream, device=True,
                                  force_device=True) == data


@pytest.mark.parametrize("name", list(CORPUS))
@pytest.mark.parametrize("level", [0, 2, 3])
def test_leg_b_our_stream_reference_inflate(name, level):
    data = CORPUS[name]
    stream = deflate_tpu.compress(data, level)
    assert ref_inflate(stream) == data


@pytest.mark.parametrize("name,bar", [("tiny.bmp", 67), ("test.bmp", 3124)])
def test_leg_c_size_at_or_below_reference_level3(name, bar):
    """The reference's level 3 is its only correct compressor; its sizes
    are the bar (SURVEY.md §6).  Both backends must beat it outright
    (the TPU path has since r2 — 2976 vs 3124; VERDICT r3 #7 dropped the
    former 5% maturation slack)."""
    data = CORPUS[name]
    native = deflate_tpu.compress(data, 3, backend="native")
    assert len(native) <= bar
    tpu = deflate_tpu.compress(data, 3)
    assert len(tpu) <= bar
