// ife_native — host-side native runtime components.
//
// TPU-native framework analog of the reference's compiled libraries
// (libIO/libHR2Reader/libString, reference src/IO/CMakeLists.txt:1-8):
// the device compute path is JAX/XLA/Pallas; this library provides the
// host-side hot paths around it:
//   * HR2 binary volume codec (zlib streaming, reference
//     src/IO/HR2Reader.cxx:11-222 format)
//   * multithreaded dense-histogram binning (the MakeBag host loop,
//     reference tools/MakeBag.cxx:448-457 / DenseHistogram.h:47-53)
//   * multithreaded masked gather (ROI voxel extraction)
//
// C ABI for ctypes. Build: make -C native   ->  native/libife_native.so
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// memory
// ---------------------------------------------------------------------------

void ife_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// HR2 codec
// ---------------------------------------------------------------------------

typedef struct {
  int64_t size[3];
  double origin[3];
  double spacing[3];
  int32_t is_float;  // 1 = float32 payload, 0 = int8 payload widened to float
} IfeHr2Info;

namespace {

const char* kTags[] = {"PixelType", "Compression", "Dimension",
                       "Size",      "Origin",      "Spacing",
                       "ImageData"};

bool read_exact(FILE* f, void* buf, size_t n) {
  return std::fread(buf, 1, n, f) == n;
}

// length-prefixed ASCII tag (reference HR2Reader.cxx:196-209)
bool read_tag(FILE* f, std::string* tag) {
  unsigned char len;
  if (!read_exact(f, &len, 1)) return false;
  std::vector<char> buf(len);
  if (!read_exact(f, buf.data(), len)) return false;
  tag->assign(buf.data(), len);
  for (const char* t : kTags)
    if (*tag == t) return true;
  return false;
}

// <=4 little-endian bytes, zero byte terminates early (HR2Reader.cxx:211-222)
bool read_field_length(FILE* f, uint32_t* out) {
  uint32_t v = 0;
  int i = 0;
  for (; i < 4; ++i) {
    unsigned char b;
    if (!read_exact(f, &b, 1)) return false;
    if (b == 0) break;
    v |= static_cast<uint32_t>(b) << (8 * i);
  }
  *out = v;
  return true;
}

}  // namespace

// Returns 0 on success. *data is malloc'd float32, x fastest (caller frees
// with ife_free). err gets a message on failure.
int ife_hr2_read(const char* path, IfeHr2Info* info, float** data,
                 char* err, int err_len) {
#define FAIL(msg)                         \
  do {                                    \
    std::snprintf(err, err_len, "%s", msg); \
    if (f) std::fclose(f);                \
    return 1;                             \
  } while (0)

  FILE* f = std::fopen(path, "rb");
  if (!f) FAIL("cannot open file");
  char magic[3];
  if (!read_exact(f, magic, 3)) FAIL("short file");
  // accepts "HR?" with ? != '3' — reference quirk (HR2Reader.cxx:97-102)
  if (!(magic[0] == 'H' && magic[1] == 'R' && magic[2] != '3'))
    FAIL("not an HR2 file");

  std::string pixel_type = "float", compression;
  info->size[0] = info->size[1] = info->size[2] = 0;
  for (int d = 0; d < 3; ++d) {
    info->origin[d] = 0.0;
    info->spacing[d] = 1.0;
  }
  uint64_t payload_len = 0;
  while (true) {
    std::string tag;
    if (!read_tag(f, &tag)) FAIL("bad header tag");
    uint32_t len;
    if (!read_field_length(f, &len)) FAIL("bad field length");
    if (tag == "ImageData") {
      payload_len = len;
      break;
    }
    std::vector<char> buf(len);
    if (!read_exact(f, buf.data(), len)) FAIL("short header field");
    std::string val(buf.data(), len);
    if (tag == "PixelType") pixel_type = val;
    else if (tag == "Compression") compression = val;
    else if (tag == "Dimension") {
      if (std::atoi(val.c_str()) != 3) FAIL("only 3D supported");
    } else if (tag == "Size" || tag == "Origin" || tag == "Spacing") {
      double v[3] = {0, 0, 0};
      if (std::sscanf(val.c_str(), "%lf %lf %lf", &v[0], &v[1], &v[2]) != 3)
        FAIL("bad triple field");
      for (int d = 0; d < 3; ++d) {
        if (tag == "Size") info->size[d] = static_cast<int64_t>(v[d]);
        else if (tag == "Origin") info->origin[d] = v[d];
        else info->spacing[d] = v[d];
      }
    }
  }
  if (compression != "ZLib") FAIL("only ZLib compression supported");
  const bool is_float = pixel_type == "float";
  if (!is_float && pixel_type != "char") FAIL("pixel type must be float|char");
  info->is_float = is_float ? 1 : 0;

  const uint64_t n =
      static_cast<uint64_t>(info->size[0]) * info->size[1] * info->size[2];
  if (n == 0) FAIL("zero-sized volume");
  const uint64_t raw_len = n * (is_float ? 4 : 1);
  std::vector<unsigned char> raw(raw_len);

  // streaming inflate, 64 KiB chunks (reference Util/InflateStream.h:12-72)
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) FAIL("inflateInit failed");
  std::vector<unsigned char> chunk(1 << 16);
  uint64_t produced = 0, consumed = 0;
  int zret = Z_OK;
  while (zret != Z_STREAM_END && consumed < payload_len) {
    const size_t want =
        std::min<uint64_t>(chunk.size(), payload_len - consumed);
    const size_t got = std::fread(chunk.data(), 1, want, f);
    if (got == 0) break;
    consumed += got;
    zs.next_in = chunk.data();
    zs.avail_in = static_cast<uInt>(got);
    while (zs.avail_in > 0 && zret != Z_STREAM_END) {
      zs.next_out = raw.data() + produced;
      zs.avail_out = static_cast<uInt>(
          std::min<uint64_t>(raw_len - produced, 1u << 30));
      if (zs.avail_out == 0) { zret = Z_STREAM_END; break; }
      zret = inflate(&zs, Z_NO_FLUSH);
      if (zret != Z_OK && zret != Z_STREAM_END) {
        inflateEnd(&zs);
        FAIL("inflate error");
      }
      produced = zs.next_out - raw.data();
    }
  }
  inflateEnd(&zs);
  if (produced < raw_len) FAIL("truncated voxel payload");
  std::fclose(f);
  f = nullptr;

  float* out = static_cast<float*>(std::malloc(n * sizeof(float)));
  if (!out) { std::snprintf(err, err_len, "oom"); return 1; }
  if (is_float) {
    std::memcpy(out, raw.data(), n * sizeof(float));
  } else {
    const int8_t* s = reinterpret_cast<const int8_t*>(raw.data());
    for (uint64_t i = 0; i < n; ++i) out[i] = static_cast<float>(s[i]);
  }
  *data = out;
  return 0;
#undef FAIL
}

namespace {

void put_field_length(std::string* out, uint32_t v) {
  // inverse of read_field_length: LE bytes up to last nonzero, then a zero
  // terminator if fewer than 4 bytes were written
  int nbytes = 0;
  for (int i = 0; i < 4; ++i)
    if ((v >> (8 * i)) & 0xFF) nbytes = i + 1;
  for (int i = 0; i < nbytes; ++i)
    out->push_back(static_cast<char>((v >> (8 * i)) & 0xFF));
  if (nbytes < 4) out->push_back('\0');
}

void put_field(std::string* out, const char* tag, const std::string& val) {
  out->push_back(static_cast<char>(std::strlen(tag)));
  out->append(tag);
  put_field_length(out, static_cast<uint32_t>(val.size()));
  out->append(val);
}

}  // namespace

// data: float32 x-fastest. pixel "float" or "char". Returns 0 on success.
int ife_hr2_write(const char* path, const IfeHr2Info* info, const float* data,
                  char* err, int err_len) {
  const uint64_t n =
      static_cast<uint64_t>(info->size[0]) * info->size[1] * info->size[2];
  const bool is_float = info->is_float != 0;
  std::vector<unsigned char> raw(n * (is_float ? 4 : 1));
  if (is_float) {
    std::memcpy(raw.data(), data, n * sizeof(float));
  } else {
    int8_t* d = reinterpret_cast<int8_t*>(raw.data());
    for (uint64_t i = 0; i < n; ++i) d[i] = static_cast<int8_t>(data[i]);
  }
  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<unsigned char> comp(bound);
  if (compress2(comp.data(), &bound, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK) {
    std::snprintf(err, err_len, "compress failed");
    return 1;
  }

  char buf[256];
  std::string hdr;
  put_field(&hdr, "PixelType", is_float ? "float" : "char");
  put_field(&hdr, "Compression", "ZLib");
  put_field(&hdr, "Dimension", "3");
  std::snprintf(buf, sizeof(buf), "%lld %lld %lld",
                static_cast<long long>(info->size[0]),
                static_cast<long long>(info->size[1]),
                static_cast<long long>(info->size[2]));
  put_field(&hdr, "Size", buf);
  std::snprintf(buf, sizeof(buf), "%.17g %.17g %.17g", info->origin[0],
                info->origin[1], info->origin[2]);
  put_field(&hdr, "Origin", buf);
  std::snprintf(buf, sizeof(buf), "%.17g %.17g %.17g", info->spacing[0],
                info->spacing[1], info->spacing[2]);
  put_field(&hdr, "Spacing", buf);
  hdr.push_back(static_cast<char>(std::strlen("ImageData")));
  hdr.append("ImageData");
  put_field_length(&hdr, static_cast<uint32_t>(bound));

  FILE* f = std::fopen(path, "wb");
  if (!f) {
    std::snprintf(err, err_len, "cannot open output");
    return 1;
  }
  bool ok = std::fwrite("HR2", 1, 3, f) == 3 &&
            std::fwrite(hdr.data(), 1, hdr.size(), f) == hdr.size() &&
            std::fwrite(comp.data(), 1, bound, f) == bound;
  std::fclose(f);
  if (!ok) {
    std::snprintf(err, err_len, "short write");
    return 1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// multithreaded histogram binning
// ---------------------------------------------------------------------------

// bin(x) = index of first edge >= x (searchsorted left) over n_edges+1 bins
// (reference DenseHistogram.h:22-53). mask: optional (nullptr = all), count
// only where mask != 0. counts must hold n_edges+1 zeros-initialized? No —
// this function zeroes it.
void ife_histogram(const float* values, int64_t n, const double* edges,
                   int32_t n_edges, const uint8_t* mask, uint64_t* counts) {
  const int32_t n_bins = n_edges + 1;
  int n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  if (n < (1 << 16)) n_threads = 1;
  std::vector<std::vector<uint64_t>> partial(
      n_threads, std::vector<uint64_t>(n_bins, 0));
  std::vector<std::thread> threads;
  const int64_t step = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t]() {
      const int64_t lo = t * step;
      const int64_t hi = std::min<int64_t>(n, lo + step);
      std::vector<uint64_t>& mine = partial[t];
      for (int64_t i = lo; i < hi; ++i) {
        if (mask && !mask[i]) continue;
        const double v = values[i];
        const double* e =
            std::lower_bound(edges, edges + n_edges, v);
        mine[static_cast<int32_t>(e - edges)]++;
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int32_t b = 0; b < n_bins; ++b) {
    uint64_t acc = 0;
    for (int t = 0; t < n_threads; ++t) acc += partial[t][b];
    counts[b] = acc;
  }
}

// Many histograms over strided channels: values is (n, n_hist) row-major;
// histogram h uses edges[h*n_edges .. ] and fills counts[h*(n_edges+1) ..].
// The MakeBag inner loop (8 features x n voxels) in one pass.
void ife_histogram_channels(const float* values, int64_t n, int32_t n_hist,
                            const double* edges, int32_t n_edges,
                            const uint8_t* mask, uint64_t* counts) {
  const int32_t n_bins = n_edges + 1;
  int n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  if (n < (1 << 14)) n_threads = 1;
  std::vector<std::vector<uint64_t>> partial(
      n_threads, std::vector<uint64_t>(static_cast<size_t>(n_hist) * n_bins, 0));
  std::vector<std::thread> threads;
  const int64_t step = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t]() {
      const int64_t lo = t * step;
      const int64_t hi = std::min<int64_t>(n, lo + step);
      std::vector<uint64_t>& mine = partial[t];
      for (int64_t i = lo; i < hi; ++i) {
        if (mask && !mask[i]) continue;
        const float* row = values + i * n_hist;
        for (int32_t h = 0; h < n_hist; ++h) {
          const double* e0 = edges + static_cast<size_t>(h) * n_edges;
          const double* e = std::lower_bound(e0, e0 + n_edges,
                                             static_cast<double>(row[h]));
          mine[static_cast<size_t>(h) * n_bins + (e - e0)]++;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  const size_t total = static_cast<size_t>(n_hist) * n_bins;
  for (size_t b = 0; b < total; ++b) {
    uint64_t acc = 0;
    for (int t = 0; t < n_threads; ++t) acc += partial[t][b];
    counts[b] = acc;
  }
}

}  // extern "C"
