// tileio — threaded satellite-tile reader/decoder for the input pipeline.
//
// The reference's host-side input parallelism is torch DataLoader workers
// (configs/config_px2px.yaml:82-84, SURVEY.md §2.9 row 5): Python processes
// decoding rasters.  This is the native equivalent: a C++ thread pool that
// reads .npy tiles (uint16 DN or float32 reflectance, CHW), converts
// DN/10000 → float32, center-crops, and hands fixed-size buffers to Python
// through a bounded queue — zero Python in the decode path, GIL never held.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libtileio.so tileio.cc -lpthread
// ABI: C, driven via ctypes (nirgan_tpu/data/native_loader.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Tile {
  int index = -1;                // position in the submitted path list
  std::vector<float> data;       // (C, crop, crop)
  int channels = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- npy I/O

// Minimal .npy reader for contiguous little-endian arrays.
// Supports dtypes <u2 (uint16 DN) and <f4 (float32), C-order, shape (C,H,W).
bool read_npy_chw(const std::string& path, std::vector<float>& out,
                  int* C, int* H, int* W, float dn_scale) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t hl;
    if (std::fread(&hl, 2, 1, f) != 1) { std::fclose(f); return false; }
    header_len = hl;
  } else {
    if (std::fread(&header_len, 4, 1, f) != 1) { std::fclose(f); return false; }
  }
  std::string header(header_len, '\0');
  if (std::fread(&header[0], 1, header_len, f) != header_len) {
    std::fclose(f);
    return false;
  }

  bool is_u2 = header.find("'<u2'") != std::string::npos ||
               header.find("'|u2'") != std::string::npos;
  bool is_f4 = header.find("'<f4'") != std::string::npos;
  if ((!is_u2 && !is_f4) ||
      header.find("'fortran_order': False") == std::string::npos) {
    std::fclose(f);
    return false;
  }
  auto sp = header.find("'shape': (");
  if (sp == std::string::npos) { std::fclose(f); return false; }
  int c = 0, h = 0, w = 0;
  if (std::sscanf(header.c_str() + sp, "'shape': (%d, %d, %d)", &c, &h, &w) != 3) {
    std::fclose(f);
    return false;
  }
  size_t n = size_t(c) * h * w;
  out.resize(n);
  if (is_u2) {
    std::vector<uint16_t> raw(n);
    if (std::fread(raw.data(), 2, n, f) != n) { std::fclose(f); return false; }
    const float inv = 1.0f / dn_scale;
    for (size_t i = 0; i < n; ++i) out[i] = raw[i] * inv;
  } else {
    if (std::fread(out.data(), 4, n, f) != n) { std::fclose(f); return false; }
  }
  std::fclose(f);
  *C = c; *H = h; *W = w;
  return true;
}

void center_crop_chw(const std::vector<float>& in, int C, int H, int W,
                     int crop, std::vector<float>& out) {
  int y0 = (H - crop) / 2, x0 = (W - crop) / 2;
  if (y0 < 0) y0 = 0;
  if (x0 < 0) x0 = 0;
  out.resize(size_t(C) * crop * crop);
  for (int c = 0; c < C; ++c)
    for (int y = 0; y < crop; ++y)
      std::memcpy(&out[(size_t(c) * crop + y) * crop],
                  &in[(size_t(c) * H + y0 + y) * W + x0],
                  sizeof(float) * crop);
}

// ---------------------------------------------------------------- pipeline

struct Pipeline {
  std::vector<std::string> paths;
  int crop;
  float dn_scale;
  size_t capacity;

  std::vector<std::thread> workers;
  std::atomic<size_t> next_item{0};

  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<Tile> queue;
  size_t produced = 0;
  bool stopped = false;

  void worker() {
    for (;;) {
      size_t i = next_item.fetch_add(1);
      if (i >= paths.size()) break;
      Tile t;
      t.index = int(i);
      std::vector<float> raw;
      int C, H, W;
      if (read_npy_chw(paths[i], raw, &C, &H, &W, dn_scale)) {
        int c2 = crop <= H && crop <= W ? crop : (H < W ? H : W);
        center_crop_chw(raw, C, H, W, c2, t.data);
        t.channels = C;
        t.ok = (c2 == crop);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return queue.size() < capacity || stopped; });
      if (stopped) return;
      queue.push(std::move(t));
      ++produced;
      cv_pop.notify_one();
    }
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.notify_all();
  }

  bool done_locked() const {
    return produced >= paths.size() && queue.empty();
  }
};

}  // namespace

extern "C" {

void* tileio_create(const char** paths, int n_paths, int crop, float dn_scale,
                    int n_threads, int capacity) {
  auto* p = new Pipeline();
  p->paths.assign(paths, paths + n_paths);
  p->crop = crop;
  p->dn_scale = dn_scale;
  p->capacity = capacity > 0 ? capacity : 16;
  int nt = n_threads > 0 ? n_threads : 4;
  for (int i = 0; i < nt; ++i)
    p->workers.emplace_back(&Pipeline::worker, p);
  return p;
}

// Pops one decoded tile into `out` (C*crop*crop floats).  Returns the item
// index, or -1 when the stream is exhausted, or -2 for a decode failure
// (index still reported via *channels = 0).
int tileio_next(void* handle, float* out, int out_capacity, int* channels) {
  auto* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_pop.wait(lk, [&] { return !p->queue.empty() || p->done_locked(); });
  if (p->queue.empty()) return -1;
  Tile t = std::move(p->queue.front());
  p->queue.pop();
  p->cv_push.notify_one();
  lk.unlock();
  *channels = t.channels;
  if (!t.ok || int(t.data.size()) > out_capacity) return -2;
  std::memcpy(out, t.data.data(), t.data.size() * sizeof(float));
  return t.index;
}

void tileio_destroy(void* handle) {
  auto* p = static_cast<Pipeline*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stopped = true;
    p->cv_push.notify_all();
    p->cv_pop.notify_all();
  }
  p->next_item.store(p->paths.size());
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
