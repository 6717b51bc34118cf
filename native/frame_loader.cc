// Native frame loader + prefetcher (the host-runtime ingestion component).
//
// The reference's per-frame hot path starts with cv::imread on the tracking
// thread (mono_kitti.cc LoadImages + the per-frame read). Here a small C++
// library owns dataset ingestion so the Python/JAX pipeline never blocks on
// IO or decode: a background worker pool decodes frames ahead of the
// consumer into a bounded ring of grayscale buffers.
//
// Formats: PGM (P5), and PNG via a minimal reader for the 8-bit
// grayscale/RGB non-interlaced subset (zlib inflate + PNG filters) — enough
// for KITTI image_0 PNGs. Other formats fall back to the Python decoder.
//
// C ABI (ctypes):
//   fl_open(paths, n, height, width, lookahead)  -> handle
//   fl_next(handle, out_buffer) -> frame index (or -1 at end, -2 decode err)
//   fl_close(handle)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  long index = -1;
  std::vector<uint8_t> gray;
  bool ok = false;
};

bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t rd = fread(out->data(), 1, n, f);
  fclose(f);
  return rd == static_cast<size_t>(n);
}

// ---------------------------------------------------------------- PGM (P5)
bool decode_pgm(const std::vector<uint8_t>& buf, int H, int W,
                std::vector<uint8_t>* gray) {
  if (buf.size() < 2 || buf[0] != 'P' || buf[1] != '5') return false;
  size_t pos = 2;
  int fields[3];
  for (int k = 0; k < 3;) {
    while (pos < buf.size() &&
           (buf[pos] == ' ' || buf[pos] == '\n' || buf[pos] == '\t' ||
            buf[pos] == '\r'))
      pos++;
    if (pos < buf.size() && buf[pos] == '#') {
      while (pos < buf.size() && buf[pos] != '\n') pos++;
      continue;
    }
    int v = 0;
    bool any = false;
    while (pos < buf.size() && buf[pos] >= '0' && buf[pos] <= '9') {
      v = v * 10 + (buf[pos] - '0');
      pos++;
      any = true;
    }
    if (!any) return false;
    fields[k++] = v;
  }
  pos++;  // single whitespace after maxval
  int w = fields[0], h = fields[1];
  if (w != W || h != H || buf.size() - pos < static_cast<size_t>(w) * h)
    return false;
  gray->assign(buf.begin() + pos, buf.begin() + pos + (size_t)w * h);
  return true;
}

// ----------------------------------------------------------------- PNG
uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const std::vector<uint8_t>& buf, int H, int W,
                std::vector<uint8_t>* gray) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (buf.size() < 8 || memcmp(buf.data(), sig, 8) != 0) return false;
  size_t pos = 8;
  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > buf.size()) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = be32(data);
      h = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w != W || h != H || bit_depth != 8 || interlace != 0) return false;
  int ch;
  switch (color_type) {
    case 0: ch = 1; break;  // gray
    case 2: ch = 3; break;  // rgb
    case 4: ch = 2; break;  // gray+alpha
    case 6: ch = 4; break;  // rgba
    default: return false;  // palette unsupported
  }
  size_t stride = (size_t)w * ch;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf out_len = raw.size();
  if (uncompress(raw.data(), &out_len, idat.data(), idat.size()) != Z_OK ||
      out_len != raw.size())
    return false;
  // de-filter in place into `img`
  std::vector<uint8_t> img(stride * h);
  for (int y = 0; y < h; y++) {
    uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* dst = &img[stride * y];
    const uint8_t* up = y ? &img[stride * (y - 1)] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= (size_t)ch ? dst[x - ch] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= (size_t)ch) ? up[x - ch] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = static_cast<uint8_t>(v);
    }
  }
  // to grayscale (BT.601-ish integer weights, matching cv2's conversion)
  gray->resize((size_t)w * h);
  if (ch == 1) {
    memcpy(gray->data(), img.data(), (size_t)w * h);
  } else if (ch == 2) {
    for (size_t i = 0; i < (size_t)w * h; i++) (*gray)[i] = img[2 * i];
  } else {
    for (size_t i = 0; i < (size_t)w * h; i++) {
      const uint8_t* px = &img[ch * i];
      (*gray)[i] =
          static_cast<uint8_t>((299 * px[0] + 587 * px[1] + 114 * px[2]) / 1000);
    }
  }
  return true;
}

struct Loader {
  std::vector<std::string> paths;
  int H = 0, W = 0;
  size_t lookahead = 8;
  std::deque<Frame> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<long> next_to_decode{0};
  long next_to_emit = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    while (!stop.load()) {
      long idx = next_to_decode.fetch_add(1);
      if (idx >= static_cast<long>(paths.size())) return;
      Frame f;
      f.index = idx;
      std::vector<uint8_t> buf;
      if (read_file(paths[idx], &buf)) {
        f.ok = decode_png(buf, H, W, &f.gray) || decode_pgm(buf, H, W, &f.gray);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || ready.size() < lookahead ||
               idx < next_to_emit + static_cast<long>(lookahead);
      });
      if (stop.load()) return;
      ready.push_back(std::move(f));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* fl_open(const char** paths, long n, int height, int width,
              int lookahead, int n_threads) {
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->H = height;
  L->W = width;
  L->lookahead = lookahead > 0 ? lookahead : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; i++) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

long fl_next(void* handle, uint8_t* out) {
  Loader* L = static_cast<Loader*>(handle);
  if (L->next_to_emit >= static_cast<long>(L->paths.size())) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  for (;;) {
    for (auto it = L->ready.begin(); it != L->ready.end(); ++it) {
      if (it->index == L->next_to_emit) {
        long idx = it->index;
        bool ok = it->ok;
        if (ok) memcpy(out, it->gray.data(), (size_t)L->H * L->W);
        L->ready.erase(it);
        L->next_to_emit++;
        L->cv_space.notify_all();
        return ok ? idx : -2;
      }
    }
    L->cv_ready.wait(lk);
  }
}

void fl_close(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
