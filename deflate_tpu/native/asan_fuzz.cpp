// ASan/UBSan fuzz driver for the native host runtime (SURVEY.md §5.2).
//
// Built and run by tests/test_native.py via the Makefile `asan_fuzz`
// target.  Feeds dt_inflate three adversarial corpora and requires that
// every case either succeeds or returns a clean negative error code —
// never a sanitizer report (the process aborts on ASan/UBSan findings,
// which the test observes as a nonzero exit):
//   1. pure random garbage (uniform bytes)
//   2. valid-stream prefixes (truncations at every granularity)
//   3. valid streams with single-byte corruptions
// Also exercises dt_deflate on random inputs and round-trips them.
//
// Reference contrast: the reference's ASan wiring exists but is
// commented out (CMakeLists.txt:11-20) and was never part of any test.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int dt_inflate(const uint8_t* in, size_t in_len, uint8_t* out,
               size_t out_cap, size_t* out_len);
int dt_deflate(const uint8_t* in, size_t in_len, int level, uint8_t* out,
               size_t out_cap, size_t* out_len);
}

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint32_t xr() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return (uint32_t)(rng_state >> 32);
}

int main() {
  std::vector<uint8_t> out(1 << 20);
  size_t out_len = 0;
  int ok = 0, err = 0;

  // 1. random garbage, varied sizes (incl. 0 and 1)
  for (int it = 0; it < 1500; ++it) {
    size_t n = it < 8 ? (size_t)it : (xr() % 4096);
    std::vector<uint8_t> buf(n ? n : 1);
    for (size_t i = 0; i < n; ++i) buf[i] = (uint8_t)xr();
    int rc = dt_inflate(buf.data(), n, out.data(), out.size(), &out_len);
    rc == 0 ? ++ok : ++err;
    if (rc > 0 || rc < -5) {
      std::fprintf(stderr, "bad rc %d\n", rc);
      return 2;
    }
  }

  // 2/3. valid streams (made by our own encoder), truncated + corrupted
  for (int it = 0; it < 120; ++it) {
    size_t n = 64 + xr() % 60000;
    std::vector<uint8_t> src(n);
    // compressible-ish: small alphabet with runs
    for (size_t i = 0; i < n; ++i)
      src[i] = (uint8_t)((xr() % 7) * 37 + ((i >> 5) & 3));
    std::vector<uint8_t> enc(n + n / 2 + 1024);
    size_t enc_len = 0;
    int lvl = (int)(xr() % 4);
    int rc = dt_deflate(src.data(), n, lvl, enc.data(), enc.size(),
                        &enc_len);
    if (rc != 0) {
      std::fprintf(stderr, "deflate rc %d\n", rc);
      return 3;
    }
    rc = dt_inflate(enc.data(), enc_len, out.data(), out.size(), &out_len);
    if (rc != 0 || out_len != n || std::memcmp(out.data(), src.data(), n)) {
      std::fprintf(stderr, "round trip failed rc=%d\n", rc);
      return 4;
    }
    // truncations: every cut must error or produce a strict prefix
    for (int t = 0; t < 16; ++t) {
      size_t cut = xr() % enc_len;
      rc = dt_inflate(enc.data(), cut, out.data(), out.size(), &out_len);
      if (rc == 0 && (out_len > n || std::memcmp(out.data(), src.data(),
                                                 out_len) != 0)) {
        std::fprintf(stderr, "truncation returned non-prefix\n");
        return 5;
      }
    }
    // single-byte corruptions
    for (int t = 0; t < 16; ++t) {
      std::vector<uint8_t> bad(enc.begin(), enc.begin() + enc_len);
      bad[xr() % enc_len] ^= (uint8_t)(1 + xr() % 255);
      (void)dt_inflate(bad.data(), enc_len, out.data(), out.size(),
                       &out_len);
    }
  }
  std::printf("asan_fuzz ok=%d err=%d\n", ok, err);
  return 0;
}
