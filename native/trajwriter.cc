// Native asynchronous trajectory writer for mdtpu.
//
// Role: the TPU-native runtime counterpart of the reference's synchronous
// in-loop file I/O (/root/reference/src/simulation.jl:139-151 reopens and
// appends the LAMMPS dump inside the hot loop; compression happens post-hoc
// via libzstd through CodecZstd, /root/reference/src/io.jl:207-223).
//
// Here a background thread owns the file: frames are enqueued as raw arrays,
// formatted with snprintf (an order of magnitude faster than Python string
// formatting for ~1e5 atoms) and written — optionally through a streaming
// libzstd compressor, so the compressed trajectory is produced on the fly
// instead of compress-then-delete. The device loop never blocks on disk.
//
// C ABI (consumed via ctypes from mdtpu/io/native_writer.py):
//   void* twr_open(const char* path, int compress, int level, int append);
//   int   twr_write_text(void* h, const char* data, int64_t len);
//   int   twr_write_lammps_frame(void* h, int64_t step, int64_t n, int dim,
//                                const double* cell,      // dim*dim row-major
//                                const double* positions, // n*dim
//                                const int32_t* images,   // n*dim
//                                const double* diameters);// n
//   int   twr_close(void* h);   // flush queue, join thread, finish zstd frame

#include <zstd.h>

#include <cmath>
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

// Fast exact "%.6f": append the correctly-rounded fixed-6 decimal of v.
//
// printf's %.6f rounds the EXACT decimal expansion of the binary double to
// 6 places; exact ties cannot occur (a tie needs v = (2k+1)/2e6, whose
// reduced denominator contains 5^6 — never a power of two). The computed
// product a*1e6 carries <= ~2e-16 relative error, so for scaled < 4e12 the
// absolute error is < 1e-3: outside a +-1e-3 band around the .5 rounding
// boundary the computed product rounds to the same integer as the exact
// value and digits can be emitted directly (~10x faster than snprintf,
// which dominated the writer at 20 MB/s / 251 ms per 65k-atom frame on one
// core). Inside the band — ~0.2% of uniform values — and for huge/inf/nan
// inputs, defer to snprintf, which is correctly rounded by construction.
// Byte-for-byte identical to snprintf("%.6f") on every input by this
// argument; pinned against Python "%.6f" in tests/test_io.py.
inline char* fmt_ll(char* p, long long x) {
  if (x < 0) {
    *p++ = '-';
    x = -x;
  }
  char tmp[20];
  int k = 0;
  do {
    tmp[k++] = static_cast<char>('0' + (x % 10));
    x /= 10;
  } while (x);
  while (k) *p++ = tmp[--k];
  return p;
}

inline char* fmt_f6(char* p, double v) {
  double a = std::fabs(v);
  double scaled = a * 1e6;
  double fl = std::floor(scaled);
  double frac = scaled - fl;
  if (!(scaled < 4.0e12) || std::fabs(frac - 0.5) < 1e-3) {
    return p + std::snprintf(p, 64, "%.6f", v);
  }
  if (std::signbit(v)) *p++ = '-';  // includes -0.000000, like printf
  long long i = static_cast<long long>(fl) + (frac > 0.5 ? 1 : 0);
  p = fmt_ll(p, i / 1000000);
  *p++ = '.';
  long long fp = i % 1000000;
  for (int d = 5; d >= 0; --d) {
    p[d] = static_cast<char>('0' + (fp % 10));
    fp /= 10;
  }
  return p + 6;
}

struct Frame {
  bool is_text = false;
  std::string text;
  int64_t step = 0;
  int64_t n = 0;
  int dim = 3;
  std::vector<double> cell;
  std::vector<double> pos;
  std::vector<int32_t> img;
  std::vector<double> diam;
};

class Writer {
 public:
  Writer(const char* path, bool compress, int level, bool append)
      : compress_(compress) {
    // Appending to a .zst is legal: zstd decodes concatenated frames.
    file_ = std::fopen(path, append ? "ab" : "wb");
    ok_ = file_ != nullptr;
    if (ok_ && compress_) {
      cctx_ = ZSTD_createCCtx();
      ZSTD_CCtx_setParameter(cctx_, ZSTD_c_compressionLevel, level);
      zbuf_.resize(ZSTD_CStreamOutSize());
    }
    if (ok_) worker_ = std::thread([this] { Loop(); });
  }

  bool ok() const { return ok_; }

  void Enqueue(Frame&& f) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      queue_.push(std::move(f));
    }
    cv_.notify_one();
  }

  int Close() {
    if (!ok_) return -1;
    {
      std::lock_guard<std::mutex> lock(mu_);
      done_ = true;
    }
    cv_.notify_one();
    worker_.join();
    if (compress_) {
      FlushZstd(nullptr, 0, /*end=*/true);
      ZSTD_freeCCtx(cctx_);
    }
    std::fclose(file_);
    ok_ = false;
    return write_error_ ? -2 : 0;
  }

 private:
  void Loop() {
    for (;;) {
      Frame f;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return done_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (done_) return;
          continue;
        }
        f = std::move(queue_.front());
        queue_.pop();
      }
      std::string payload = f.is_text ? std::move(f.text) : Format(f);
      Write(payload.data(), payload.size());
    }
  }

  // Format identical to mdtpu.io.lammps.format_lammps_frame (and therefore to
  // /root/reference/src/io.jl:96-170).
  std::string Format(const Frame& f) {
    std::string out;
    out.reserve(96 + static_cast<size_t>(f.n) * (f.dim == 2 ? 96 : 128));
    char buf[512];
    auto emit = [&](const char* fmt, auto... args) {
      int len = std::snprintf(buf, sizeof(buf), fmt, args...);
      out.append(buf, len);
    };

    double box[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
    for (int i = 0; i < f.dim; ++i)
      for (int j = 0; j < f.dim; ++j) box[i][j] = f.cell[i * f.dim + j];

    auto colnorm = [&](int j) {
      return std::sqrt(box[0][j] * box[0][j] + box[1][j] * box[1][j] +
                       box[2][j] * box[2][j]);
    };

    emit("ITEM: TIMESTEP\n%lld\n", static_cast<long long>(f.step));
    emit("ITEM: NUMBER OF ATOMS\n%lld\n", static_cast<long long>(f.n));
    if (f.dim == 2) {
      emit("ITEM: BOX BOUNDS xy pp pp\n");
      emit("%.6f %.6f %.6f\n", 0.0, colnorm(0), box[0][1]);
      emit("%.6f %.6f 0.0\n", 0.0, colnorm(1));
      emit("%.6f %.6f 0.0\n", 0.0, 1.0);
      emit("ITEM: ATOMS id type radius x y xu yu\n");
    } else {
      emit("ITEM: BOX BOUNDS xy xz yz pp pp pp\n");
      emit("%.6f %.6f %.6f\n", 0.0, colnorm(0), box[0][1]);
      emit("%.6f %.6f %.6f\n", 0.0, colnorm(1), box[1][2]);
      emit("%.6f %.6f %.6f\n", 0.0, colnorm(2), box[0][2]);
      emit("ITEM: ATOMS id type radius x y z xu yu zu\n");
    }

    char row[512];
    for (int64_t i = 0; i < f.n; ++i) {
      const double* p = &f.pos[i * f.dim];
      const int32_t* im = &f.img[i * f.dim];
      double uw[3];
      for (int k = 0; k < f.dim; ++k) {
        uw[k] = p[k];
        for (int j = 0; j < f.dim; ++j) uw[k] += box[k][j] * im[j];
      }
      char* q = row;
      q = fmt_ll(q, i + 1);
      *q++ = ' ';
      *q++ = '1';
      *q++ = ' ';
      q = fmt_f6(q, f.diam[i] / 2.0);
      for (int k = 0; k < f.dim; ++k) {
        *q++ = ' ';
        q = fmt_f6(q, p[k]);
      }
      for (int k = 0; k < f.dim; ++k) {
        *q++ = ' ';
        q = fmt_f6(q, uw[k]);
      }
      *q++ = '\n';
      out.append(row, static_cast<size_t>(q - row));
    }
    return out;
  }

  void Write(const char* data, size_t len) {
    if (compress_) {
      FlushZstd(data, len, /*end=*/false);
    } else if (std::fwrite(data, 1, len, file_) != len) {
      write_error_ = true;
    }
  }

  void FlushZstd(const char* data, size_t len, bool end) {
    ZSTD_inBuffer in{data, len, 0};
    ZSTD_EndDirective mode = end ? ZSTD_e_end : ZSTD_e_continue;
    for (;;) {
      ZSTD_outBuffer out{zbuf_.data(), zbuf_.size(), 0};
      size_t remaining = ZSTD_compressStream2(cctx_, &out, &in, mode);
      if (out.pos &&
          std::fwrite(zbuf_.data(), 1, out.pos, file_) != out.pos) {
        write_error_ = true;
        return;
      }
      if (end ? (remaining == 0) : (in.pos == in.size)) break;
    }
  }

  FILE* file_ = nullptr;
  bool ok_ = false;
  bool compress_ = false;
  bool write_error_ = false;
  ZSTD_CCtx* cctx_ = nullptr;
  std::vector<char> zbuf_;
  std::thread worker_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<Frame> queue_;
  bool done_ = false;
};

}  // namespace

extern "C" {

void* twr_open(const char* path, int compress, int level, int append) {
  auto* w = new Writer(path, compress != 0, level, append != 0);
  if (!w->ok()) {
    delete w;
    return nullptr;
  }
  return w;
}

int twr_write_text(void* h, const char* data, int64_t len) {
  if (!h) return -1;
  Frame f;
  f.is_text = true;
  f.text.assign(data, static_cast<size_t>(len));
  static_cast<Writer*>(h)->Enqueue(std::move(f));
  return 0;
}

int twr_write_lammps_frame(void* h, int64_t step, int64_t n, int dim,
                           const double* cell, const double* positions,
                           const int32_t* images, const double* diameters) {
  if (!h || (dim != 2 && dim != 3)) return -1;
  Frame f;
  f.step = step;
  f.n = n;
  f.dim = dim;
  f.cell.assign(cell, cell + dim * dim);
  f.pos.assign(positions, positions + n * dim);
  f.img.assign(images, images + n * dim);
  f.diam.assign(diameters, diameters + n);
  static_cast<Writer*>(h)->Enqueue(std::move(f));
  return 0;
}

int twr_close(void* h) {
  if (!h) return -1;
  auto* w = static_cast<Writer*>(h);
  int rc = w->Close();
  delete w;
  return rc;
}

}  // extern "C"
