// Sanitizer self-test driver for the native codec (survey §5: sanitizers).
//
// Exercises header parsing, batched decode, and P4 packing — including the
// error paths the reference handles unsafely (unterminated comments,
// truncated payloads, trailing bytes) — so ASan/UBSan can observe the whole
// surface. Built and run by tests/test_sanitizers.py with
// -fsanitize=address,undefined; exits nonzero on any behavioral mismatch.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <unistd.h>

extern "C" {
int ppmx_parse_header(const uint8_t*, size_t, uint32_t*, uint32_t*, uint32_t*,
                      size_t*);
int ppmx_decode_one(const uint8_t*, size_t, uint8_t*, uint32_t, uint32_t);
int ppmx_decode_batch(const uint8_t* const*, const size_t*, int, uint8_t*,
                      uint32_t, uint32_t, int);
void ppmx_pack_bits(const uint8_t*, uint8_t*, uint32_t, uint32_t);
int ppmx_encode_batch_files(const uint8_t*, size_t, size_t, int,
                            const char* const*, const uint8_t* const*,
                            const size_t*, int*, int);
int ppmx_decode_batch_files(const char* const*, int, uint8_t*, uint32_t,
                            uint32_t, int*, int);
}

static int failures = 0;
#define CHECK(cond, msg)                              \
  do {                                                \
    if (!(cond)) {                                    \
      std::fprintf(stderr, "FAIL: %s\n", msg);        \
      ++failures;                                     \
    }                                                 \
  } while (0)

static std::string make_p6(uint32_t w, uint32_t h, const char* header_extra) {
  std::string s = "P6\n";
  s += header_extra;
  char dims[64];
  std::snprintf(dims, sizeof dims, "%u %u\n255\n", w, h);
  s += dims;
  for (uint32_t i = 0; i < w * h * 3; ++i)
    s.push_back(static_cast<char>(i * 7 + 3));
  return s;
}

int main() {
  uint32_t w, h, mv;
  size_t off;

  // Happy path with comments everywhere.
  std::string good = make_p6(5, 3, "# a comment\n#another\n");
  CHECK(ppmx_parse_header(reinterpret_cast<const uint8_t*>(good.data()),
                          good.size(), &w, &h, &mv, &off) == 0,
        "good header parses");
  CHECK(w == 5 && h == 3 && mv == 255, "dims parsed");

  // Error paths (must not read out of bounds under ASan).
  const char* bads[] = {
      "P5\n2 2\n255\n\0\0\0\0",       // wrong magic
      "P6\n2 2\n255\n\1\1",           // short payload
      "P6\n2 2\n255 #unterminated",   // comment to EOF
      "P6\n",                         // truncated header
      "",                             // empty
      "\xff\xfe\xfd",                 // binary garbage
  };
  const size_t bad_sizes[] = {12 + 4, 11 + 2, 21, 3, 0, 3};
  for (size_t i = 0; i < sizeof(bads) / sizeof(bads[0]); ++i) {
    int rc = ppmx_parse_header(reinterpret_cast<const uint8_t*>(bads[i]),
                               bad_sizes[i], &w, &h, &mv, &off);
    CHECK(rc != 0, "bad input rejected");
  }

  // Header-int digit bound (quirk-B4 hardening): tokens longer than 9
  // digit CHARS reject — leading zeros count, exactly like the
  // reference's raw 10-byte token buffer.
  {
    std::string big = "P6\n2 2\n999999999255\n";
    for (int i = 0; i < 12; ++i) big.push_back('\1');
    CHECK(ppmx_parse_header(reinterpret_cast<const uint8_t*>(big.data()),
                            big.size(), &w, &h, &mv, &off) == -9,
          "12-char maxval rejected with the dedicated digit code");
    std::string zeros = "P6\n2 2\n0000000000255\n";
    for (int i = 0; i < 12; ++i) zeros.push_back('\1');
    CHECK(ppmx_parse_header(reinterpret_cast<const uint8_t*>(zeros.data()),
                            zeros.size(), &w, &h, &mv, &off) == -9,
          "13-char leading-zero run rejected (raw chars count)");
    std::string nine = "P6\n2 2\n999999999\n";
    for (int i = 0; i < 12; ++i) nine.push_back('\1');
    CHECK(ppmx_parse_header(reinterpret_cast<const uint8_t*>(nine.data()),
                            nine.size(), &w, &h, &mv, &off) == 0 &&
              mv == 999999999u,
          "9-char boundary accepted exactly");
  }

  // Batched decode round trip.
  std::vector<std::string> files;
  std::vector<const uint8_t*> ptrs;
  std::vector<size_t> sizes;
  for (int i = 0; i < 7; ++i) {
    files.push_back(make_p6(9, 4, i % 2 ? "#c\n" : ""));
  }
  for (auto& f : files) {
    ptrs.push_back(reinterpret_cast<const uint8_t*>(f.data()));
    sizes.push_back(f.size());
  }
  std::vector<uint8_t> out(7 * 4 * 9 * 3);
  CHECK(ppmx_decode_batch(ptrs.data(), sizes.data(), 7, out.data(), 9, 4, 3) ==
            0,
        "batch decodes");
  CHECK(out[0] == 3, "first pixel byte");

  // Batch with one corrupt member fails cleanly.
  files[3].pop_back();
  sizes[3] -= 1;
  CHECK(ppmx_decode_batch(ptrs.data(), sizes.data(), 7, out.data(), 9, 4, 2) !=
            0,
        "corrupt member detected");

  // P4 packing: width 5 -> 1 byte/row, MSB-first.
  uint8_t bits[2][5] = {{1, 0, 1, 1, 0}, {0, 1, 0, 0, 1}};
  uint8_t packed[2];
  ppmx_pack_bits(&bits[0][0], packed, 5, 2);
  CHECK(packed[0] == 0xB0 && packed[1] == 0x48, "MSB-first packing");

  // Odd widths across the byte boundary.
  for (uint32_t wid = 1; wid <= 17; ++wid) {
    std::vector<uint8_t> src(wid * 3, 1);
    std::vector<uint8_t> dst(((wid + 7) / 8) * 3);
    ppmx_pack_bits(src.data(), dst.data(), wid, 3);
  }

  // Batched parallel encode: round-trip through the decoder, plus the
  // per-file error surface on an unwritable path.
  {
    char dirtmpl[] = "/tmp/ppmx_selftest_XXXXXX";
    char* dir = mkdtemp(dirtmpl);
    CHECK(dir != nullptr, "mkdtemp");
    const int n = 5;
    const uint32_t ew = 9, eh = 4;
    std::vector<uint8_t> payloads(n * ew * eh * 3);
    for (size_t i = 0; i < payloads.size(); ++i)
      payloads[i] = static_cast<uint8_t>(i * 13 + 1);
    std::string hdr = "P6\n# generated by ppmx_edward\n9 4\n255\n";
    std::vector<std::string> enc_paths;
    std::vector<const char*> enc_cpaths;
    std::vector<const uint8_t*> hdrs;
    std::vector<size_t> hdr_lens;
    for (int i = 0; i < n; ++i) {
      enc_paths.push_back(std::string(dir) + "/enc" + std::to_string(i) +
                          ".ppm");
      hdrs.push_back(reinterpret_cast<const uint8_t*>(hdr.data()));
      hdr_lens.push_back(hdr.size());
    }
    for (auto& p : enc_paths) enc_cpaths.push_back(p.c_str());
    std::vector<int> enc_rcs(n, -99);
    const size_t stride = ew * eh * 3;
    CHECK(ppmx_encode_batch_files(payloads.data(), stride, stride, n,
                                  enc_cpaths.data(), hdrs.data(),
                                  hdr_lens.data(), enc_rcs.data(), 3) == 0,
          "batch encode succeeds");
    for (int i = 0; i < n; ++i) CHECK(enc_rcs[i] == 0, "per-file rc ok");
    // Decode one written file back and compare payload bytes.
    std::FILE* f = std::fopen(enc_cpaths[2], "rb");
    CHECK(f != nullptr, "written file opens");
    if (f) {
      std::string data(hdr.size() + stride + 1, '\0');
      size_t got = std::fread(&data[0], 1, data.size(), f);
      std::fclose(f);
      CHECK(got == hdr.size() + stride, "written file size exact");
      data.resize(got);
      std::vector<uint8_t> dec(ew * eh * 3);
      CHECK(ppmx_decode_one(reinterpret_cast<const uint8_t*>(data.data()),
                            hdr.size() + stride, dec.data(), ew, eh) == 0,
            "round-trip decode");
      CHECK(std::memcmp(dec.data(), payloads.data() + 2 * stride, stride) == 0,
            "round-trip payload bytes");
    }
    // One bad path among good ones: only that file's rc fails.
    enc_paths[1] = std::string(dir) + "/no_such_dir/enc.ppm";
    enc_cpaths.clear();
    for (auto& p : enc_paths) enc_cpaths.push_back(p.c_str());
    std::fill(enc_rcs.begin(), enc_rcs.end(), -99);
    CHECK(ppmx_encode_batch_files(payloads.data(), stride, stride, n,
                                  enc_cpaths.data(), hdrs.data(),
                                  hdr_lens.data(), enc_rcs.data(), 2) == -10,
          "bad path reported");
    CHECK(enc_rcs[1] == -10, "bad file rc is open-failure");
    CHECK(enc_rcs[0] == 0 && enc_rcs[2] == 0 && enc_rcs[3] == 0 &&
              enc_rcs[4] == 0,
          "good files unaffected by the bad one");
    // File-native batched DECODE over the files just written: payloads
    // pread() directly into the batch tensor, per-file rc isolation for
    // missing / truncated / straddling-header members.
    enc_paths[1] = std::string(dir) + "/enc1.ppm";  // restore the good path
    enc_cpaths.clear();
    for (auto& p : enc_paths) enc_cpaths.push_back(p.c_str());
    std::vector<uint8_t> dec_batch(n * stride, 0xEE);
    std::vector<int> dec_rcs(n, -99);
    CHECK(ppmx_decode_batch_files(enc_cpaths.data(), n, dec_batch.data(), ew,
                                  eh, dec_rcs.data(), 3) == 0,
          "file batch decodes");
    CHECK(std::memcmp(dec_batch.data(), payloads.data(), n * stride) == 0,
          "file batch payload bytes");
    // Missing member + truncated member: only those files' rcs fail.
    std::string truncated = std::string(dir) + "/trunc.ppm";
    std::FILE* tf = std::fopen(truncated.c_str(), "wb");
    CHECK(tf != nullptr, "truncated file created");
    if (tf) {
      std::fwrite(hdr.data(), 1, hdr.size(), tf);
      std::fwrite(payloads.data(), 1, stride - 5, tf);
      std::fclose(tf);
    }
    std::string missing = std::string(dir) + "/missing.ppm";
    enc_paths[1] = missing;
    enc_paths[3] = truncated;
    enc_cpaths.clear();
    for (auto& p : enc_paths) enc_cpaths.push_back(p.c_str());
    std::fill(dec_rcs.begin(), dec_rcs.end(), -99);
    CHECK(ppmx_decode_batch_files(enc_cpaths.data(), n, dec_batch.data(), ew,
                                  eh, dec_rcs.data(), 2) != 0,
          "bad members detected");
    CHECK(dec_rcs[0] == 0 && dec_rcs[2] == 0 && dec_rcs[4] == 0,
          "good files decode around bad ones");
    CHECK(dec_rcs[1] == -10, "missing file rc is open-failure");
    CHECK(dec_rcs[3] == -6, "truncated file rc is short-payload");
    // Header straddling a 64 KB prefix exercises the whole-file heap path.
    std::string bigc = std::string(dir) + "/bigc.ppm";
    std::FILE* bf = std::fopen(bigc.c_str(), "wb");
    CHECK(bf != nullptr, "bigc file created");
    if (bf) {
      std::fputs("P6\n#", bf);
      for (int i = 0; i < 70000; ++i) std::fputc('x', bf);
      std::fputs("\n9 4\n255\n", bf);
      std::fwrite(payloads.data(), 1, stride, bf);
      std::fclose(bf);
      const char* bp = bigc.c_str();
      int brc = -99;
      std::fill(dec_batch.begin(), dec_batch.begin() + stride, 0xEE);
      CHECK(ppmx_decode_batch_files(&bp, 1, dec_batch.data(), ew, eh, &brc,
                                    1) == 0,
            "straddling header decodes via whole-file retry");
      CHECK(std::memcmp(dec_batch.data(), payloads.data(), stride) == 0,
            "straddle payload bytes");
      std::remove(bigc.c_str());
    }
    std::remove(truncated.c_str());
    enc_paths[1] = std::string(dir) + "/enc1.ppm";
    enc_paths[3] = std::string(dir) + "/enc3.ppm";
    for (auto& p : enc_paths) std::remove(p.c_str());
    rmdir(dir);
  }

  if (failures) {
    std::fprintf(stderr, "%d failures\n", failures);
    return 1;
  }
  std::puts("selftest OK");
  return 0;
}
