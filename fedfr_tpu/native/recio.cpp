// Native data plane: threaded indexed-RecordIO reader + JPEG decode.
//
// The reference leans on mxnet's C++ RecordIO/imdecode for host-side data
// throughput (reference dataset.py:195,220).  This library provides the
// equivalent for the rebuild: mmap'd rec files, an idx offset table, per-batch
// multithreaded decode (libjpeg for JPEG payloads, raw memcpy for the FRAW
// fixture format) straight into a caller-provided NHWC uint8 tensor.
//
// Build: g++ -O3 -march=native -shared -fPIC recio.cpp -o librecio.so -ljpeg
//
// C ABI (ctypes-friendly):
//   void*  recio_open(const char* idx, const char* rec);
//   void   recio_close(void* h);
//   long   recio_num_keys(void* h);
//   int    recio_read_labels(void* h, const long* keys, long n, int* out);
//   int    recio_batch_decode(void* h, const long* keys, long n,
//                             unsigned char* out_imgs, int height, int width,
//                             int* out_labels, int nthreads);
// Returns 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <jpeglib.h>

namespace {

constexpr uint32_t kMagic = 0xced7230a;
constexpr uint32_t kLenMask = (1u << 29) - 1;

struct Handle {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  std::unordered_map<int64_t, size_t> offsets;
  std::vector<int64_t> keys;
};

struct Record {
  uint32_t flag;
  float label;            // scalar label (flag == 0)
  const float* labels;    // array label (flag > 0)
  const uint8_t* payload;
  size_t payload_len;
};

bool parse_record(const Handle* h, int64_t key, Record* out) {
  auto it = h->offsets.find(key);
  if (it == h->offsets.end()) return false;
  size_t off = it->second;
  if (off + 8 > h->size) return false;
  uint32_t magic, lrec;
  std::memcpy(&magic, h->base + off, 4);
  std::memcpy(&lrec, h->base + off + 4, 4);
  if (magic != kMagic) return false;
  // mxnet continuation framing (cflag != 0, bodies split over multiple
  // records) is unsupported: fail like the Python reader does instead of
  // decoding a truncated first fragment as a whole record
  if (lrec >> 29) return false;
  size_t len = lrec & kLenMask;
  if (off + 8 + len > h->size) return false;
  const uint8_t* body = h->base + off + 8;
  // IRHeader: uint32 flag, float label, uint64 id, uint64 id2 (24 bytes)
  if (len < 24) return false;
  std::memcpy(&out->flag, body, 4);
  std::memcpy(&out->label, body + 4, 4);
  const uint8_t* p = body + 24;
  size_t rest = len - 24;
  if (out->flag > 0) {
    size_t lab_bytes = size_t(out->flag) * 4;
    if (rest < lab_bytes) return false;
    out->labels = reinterpret_cast<const float*>(p);
    p += lab_bytes;
    rest -= lab_bytes;
  } else {
    out->labels = nullptr;
  }
  out->payload = p;
  out->payload_len = rest;
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode one payload into out (height*width*3, RGB). Returns 0 ok.
int decode_payload(const uint8_t* payload, size_t len, uint8_t* out,
                   int height, int width) {
  if (len >= 10 && std::memcmp(payload, "FRAW", 4) == 0) {
    uint16_t h, w, c;
    std::memcpy(&h, payload + 4, 2);
    std::memcpy(&w, payload + 6, 2);
    std::memcpy(&c, payload + 8, 2);
    if (h != height || w != width || c != 3) return -2;
    if (len < 10 + size_t(h) * w * c) return -3;
    std::memcpy(out, payload + 10, size_t(h) * w * c);
    return 0;
  }
  // JPEG
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(payload), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (int(cinfo.output_width) != width || int(cinfo.output_height) != height ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -5;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + size_t(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

void* recio_open(const char* idx_path, const char* rec_path) {
  auto* h = new Handle();
  h->fd = open(rec_path, O_RDONLY);
  if (h->fd < 0) {
    delete h;
    return nullptr;
  }
  struct stat st;
  if (fstat(h->fd, &st) != 0) {
    close(h->fd);
    delete h;
    return nullptr;
  }
  h->size = size_t(st.st_size);
  h->base = static_cast<const uint8_t*>(
      mmap(nullptr, h->size, PROT_READ, MAP_PRIVATE, h->fd, 0));
  if (h->base == MAP_FAILED) {
    close(h->fd);
    delete h;
    return nullptr;
  }
  madvise(const_cast<uint8_t*>(h->base), h->size, MADV_WILLNEED);

  FILE* f = fopen(idx_path, "r");
  if (!f) {
    munmap(const_cast<uint8_t*>(h->base), h->size);
    close(h->fd);
    delete h;
    return nullptr;
  }
  long long key, off;
  while (fscanf(f, "%lld\t%lld", &key, &off) == 2) {
    h->offsets.emplace(key, size_t(off));
    h->keys.push_back(key);
  }
  fclose(f);
  return h;
}

void recio_close(void* hp) {
  auto* h = static_cast<Handle*>(hp);
  if (!h) return;
  if (h->base) munmap(const_cast<uint8_t*>(h->base), h->size);
  if (h->fd >= 0) close(h->fd);
  delete h;
}

long recio_num_keys(void* hp) {
  return static_cast<Handle*>(hp)->keys.size();
}

int recio_read_labels(void* hp, const long* keys, long n, int* out) {
  auto* h = static_cast<Handle*>(hp);
  for (long i = 0; i < n; ++i) {
    Record r;
    if (!parse_record(h, keys[i], &r)) return -1;
    out[i] = int(r.flag > 0 ? r.labels[0] : r.label);
  }
  return 0;
}

int recio_batch_decode(void* hp, const long* keys, long n,
                       unsigned char* out_imgs, int height, int width,
                       int* out_labels, int nthreads) {
  auto* h = static_cast<Handle*>(hp);
  if (nthreads < 1) nthreads = 1;
  std::atomic<long> next(0);
  std::atomic<int> status(0);
  size_t img_bytes = size_t(height) * width * 3;

  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n || status.load() != 0) return;
      Record r;
      if (!parse_record(h, keys[i], &r)) {
        status.store(-1);
        return;
      }
      out_labels[i] = int(r.flag > 0 ? r.labels[0] : r.label);
      int rc = decode_payload(r.payload, r.payload_len,
                              out_imgs + size_t(i) * img_bytes, height, width);
      if (rc != 0) status.store(rc);
    }
  };

  if (nthreads == 1 || n < 4) {
    worker();
  } else {
    std::vector<std::thread> threads;
    int k = std::min<long>(nthreads, n);
    threads.reserve(k);
    for (int t = 0; t < k; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return status.load();
}

}  // extern "C"
