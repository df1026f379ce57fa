// tileio — threaded satellite-tile reader/decoder for the input pipeline.
//
// The reference's host-side input parallelism is torch DataLoader workers
// (configs/config_px2px.yaml:82-84, SURVEY.md §2.9 row 5): Python processes
// decoding rasters.  This is the native equivalent: a C++ thread pool that
// reads .npy tiles (uint16 DN or float32 reflectance, CHW) and GeoTIFFs
// (striped/tiled, chunky/planar, u8/u16/f32, uncompressed/DEFLATE/LZW/
// PackBits/ZSTD with the horizontal-differencing predictor, plus new-style
// JPEG (tag 7, baseline 8-bit, JPEGTables splicing) via the system libjpeg
// — the contract of /root/reference/data/SR_dataset_RGB.py), converts
// DN/10000 → float32, center-crops, and hands fixed-size buffers to Python
// through a bounded queue — zero Python in the decode path, GIL never held.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libtileio.so tileio.cc \
//             -lpthread -lz -lzstd -ljpeg
// ABI: C, driven via ctypes (nirgan_tpu/data/native_loader.py).

#include <cstddef>  // jpeglib.h uses size_t/FILE without including them
#include <cstdio>

#include <jpeglib.h>
#include <zlib.h>
#include <zstd.h>

#include <csetjmp>

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

// ---------------------------------------------------------------- TIFF I/O
//
// Classic TIFF (both byte orders), uncompressed / DEFLATE / LZW / PackBits
// (+ predictor 2), striped or tiled, chunky or planar, uint8/uint16/float32
// samples — the C++ twin of the reference-implementation reader in
// nirgan_tpu/data/geotiff.py (which owns the geo-key handling; this decode
// path only needs pixels).

struct TiffTag {
  uint16_t type = 0;
  std::vector<uint64_t> ivals;  // integral values
};

static uint16_t rd16(const unsigned char* p, bool be) {
  return be ? (p[0] << 8) | p[1] : (p[1] << 8) | p[0];
}
static uint32_t rd32(const unsigned char* p, bool be) {
  return be ? (uint32_t(p[0]) << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
            : (uint32_t(p[3]) << 24) | (p[2] << 16) | (p[1] << 8) | p[0];
}
static uint64_t rd64(const unsigned char* p, bool be) {
  return be ? (uint64_t(rd32(p, be)) << 32) | rd32(p + 4, be)
            : (uint64_t(rd32(p + 4, be)) << 32) | rd32(p, be);
}

// TIFF LZW (compression=5): MSB-first codes, 9→12 bits, Clear=256, EOI=257,
// early-change width growth (the decoder widens at (1<<w)-1 table entries).
static bool lzw_decode(const unsigned char* src, size_t n,
                       std::vector<unsigned char>& out) {
  std::vector<int> prefix(4096, -1);
  std::vector<unsigned char> suffix(4096), first(4096);
  for (int i = 0; i < 256; ++i) suffix[i] = first[i] = (unsigned char)i;
  int width = 9, next = 258, prev = -1;
  size_t bitpos = 0, nbits = n * 8;
  unsigned char stack[4096];
  auto emit = [&](int code) {
    int l = 0, c = code;
    while (c >= 256) { stack[l++] = suffix[c]; c = prefix[c]; }
    stack[l++] = suffix[c];
    while (l) out.push_back(stack[--l]);
  };
  for (;;) {
    if (bitpos + width > nbits) break;  // truncated stream: treat as EOI
    size_t b = bitpos >> 3;
    uint32_t chunk = 0;
    for (int k = 0; k < 4; ++k)
      chunk = (chunk << 8) | (b + k < n ? src[b + k] : 0);
    int code = int((chunk >> (32 - int(bitpos & 7) - width)) &
                   ((1u << width) - 1));
    bitpos += width;
    if (code == 257) break;                                  // EOI
    if (code == 256) { width = 9; next = 258; prev = -1; continue; }
    if (prev < 0) {
      if (code >= 256) return false;
      emit(code);
      prev = code;
      continue;
    }
    if (code > next || next >= 4096) return false;
    prefix[next] = prev;
    suffix[next] = (code == next) ? first[prev] : first[code];
    first[next] = first[prev];
    ++next;
    emit(code);
    prev = code;
    if (next == (1 << width) - 1 && width < 12) ++width;
  }
  return true;
}

static void packbits_decode(const unsigned char* src, size_t n,
                            std::vector<unsigned char>& out) {
  size_t i = 0;
  while (i < n) {
    unsigned char h = src[i++];
    if (h < 128) {
      size_t cnt = size_t(h) + 1;
      if (cnt > n - i) cnt = n - i;
      out.insert(out.end(), src + i, src + i + cnt);
      i += cnt;
    } else if (h > 128 && i < n) {
      out.insert(out.end(), 257 - h, src[i++]);
    }  // h == 128: no-op
  }
}

// New-style JPEG-in-TIFF (compression=7).  Segments are usually abbreviated
// streams — quantisation/Huffman tables live once in the JPEGTables tag and
// are spliced in after the segment's SOI before handing the stream to
// libjpeg.  libjpeg's default error handler exit()s the process; replace it
// with a longjmp so a corrupt tile fails the tile, not the trainer.
struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf env;
};

static void jpeg_error_trap(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->env, 1);
}

// Decode one JPEG segment into exactly rows*row_w*spp interleaved uint8
// samples (MCU padding cropped, short decodes zero-filled).
static bool jpeg_decode_seg(const unsigned char* data, size_t n,
                            const std::vector<unsigned char>& tables,
                            int rows, int row_w, int spp,
                            std::vector<unsigned char>& out) {
  std::vector<unsigned char> merged;
  const unsigned char* src = data;
  size_t srcn = n;
  if (tables.size() > 4 && n > 2 && data[0] == 0xFF && data[1] == 0xD8) {
    merged.reserve(tables.size() + n);
    merged.insert(merged.end(), data, data + 2);  // SOI
    merged.insert(merged.end(), tables.begin() + 2, tables.end() - 2);
    merged.insert(merged.end(), data + 2, data + n);
    src = merged.data();
    srcn = merged.size();
  }
  out.assign(size_t(rows) * row_w * spp, 0);
  std::vector<unsigned char> line;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_trap;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(src),
               static_cast<unsigned long>(srcn));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_start_decompress(&cinfo);
  if (int(cinfo.output_components) != spp) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  line.resize(size_t(cinfo.output_width) * spp);
  int y = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* lp = line.data();
    if (jpeg_read_scanlines(&cinfo, &lp, 1) != 1) break;
    if (y < rows) {
      size_t w = cinfo.output_width < unsigned(row_w) ? cinfo.output_width
                                                      : unsigned(row_w);
      std::memcpy(&out[size_t(y) * row_w * spp], line.data(), w * spp);
    }
    ++y;
  }
  jpeg_abort_decompress(&cinfo);  // tolerate trailing scanlines we skipped
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Undo TIFF predictor 2 (horizontal differencing) in place, per row, with
// the sample dtype's wraparound arithmetic.  row_samples = pixels*spp.
static void unpredict2(unsigned char* p, size_t n_bytes, int row_samples,
                       int spp, int item, bool be) {
  size_t row_bytes = size_t(row_samples) * item;
  for (size_t r = 0; r + row_bytes <= n_bytes; r += row_bytes) {
    unsigned char* row = p + r;
    if (item == 1) {
      for (int i = spp; i < row_samples; ++i)
        row[i] = (unsigned char)(row[i] + row[i - spp]);
    } else {  // item == 2 (uint16)
      for (int i = spp; i < row_samples; ++i) {
        uint16_t v = uint16_t(rd16(row + size_t(i - spp) * 2, be) +
                              rd16(row + size_t(i) * 2, be));
        if (be) {
          row[i * 2] = v >> 8;
          row[i * 2 + 1] = v & 0xFF;
        } else {
          row[i * 2] = v & 0xFF;
          row[i * 2 + 1] = v >> 8;
        }
      }
    }
  }
}

// Decompress + un-predict one strip/tile.  On success *base points at
// `expect` bytes of sample data (into `buf` when a zero-copy view works,
// else into `seg`).
static bool decode_segment(const std::vector<unsigned char>& buf,
                           uint64_t off, uint64_t cnt, int comp, int pred,
                           int row_samples, int spp, int item, bool be,
                           size_t expect, std::vector<unsigned char>& seg,
                           const unsigned char** base,
                           const std::vector<unsigned char>* jtab = nullptr) {
  if (comp == 1) {
    if (off + expect > buf.size()) return false;
    if (pred == 1) {
      *base = &buf[off];
      return true;
    }
    seg.assign(&buf[off], &buf[off] + expect);
  } else {
    if (off + cnt > buf.size()) return false;
    seg.clear();
    seg.reserve(expect);
    if (comp == 5) {
      if (!lzw_decode(&buf[off], cnt, seg)) return false;
    } else if (comp == 7) {
      static const std::vector<unsigned char> kNoTables;
      int rows = int(expect / size_t(row_samples));  // item == 1 for JPEG
      if (!jpeg_decode_seg(&buf[off], cnt, jtab ? *jtab : kNoTables, rows,
                           row_samples / spp, spp, seg))
        return false;
    } else if (comp == 32773) {
      packbits_decode(&buf[off], cnt, seg);
    } else if (comp == 50000) {  // ZSTD (GDAL private tag)
      seg.resize(expect);
      size_t got = ZSTD_decompress(seg.data(), expect, &buf[off], cnt);
      if (ZSTD_isError(got)) return false;
      seg.resize(got);
    } else {  // 8 / 32946: zlib DEFLATE
      seg.resize(expect);
      uLongf dlen = expect;
      if (uncompress(seg.data(), &dlen, &buf[off], cnt) != Z_OK) return false;
      seg.resize(dlen);
    }
    if (seg.size() < expect) seg.resize(expect, 0);
  }
  if (pred == 2) unpredict2(seg.data(), expect, row_samples, spp, item, be);
  *base = seg.data();
  return true;
}

bool read_tiff_chw(const std::string& path, std::vector<float>& out,
                   int* C, int* H, int* W, float dn_scale) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(sz);
  if (std::fread(buf.data(), 1, sz, f) != size_t(sz)) { std::fclose(f); return false; }
  std::fclose(f);
  if (sz < 8) return false;
  bool be;
  if (buf[0] == 'I' && buf[1] == 'I') be = false;
  else if (buf[0] == 'M' && buf[1] == 'M') be = true;
  else return false;
  // Classic TIFF (magic 42: u32 offsets, 12-byte entries) or BigTIFF
  // (magic 43: u64 offsets, 20-byte entries, LONG8 types 16-18) — large
  // satellite scenes (>4 GB mosaics) ship as BigTIFF.
  uint16_t magic = rd16(&buf[2], be);
  if (magic != 42 && magic != 43) return false;
  bool big = (magic == 43);
  if (big && (sz < 16 || rd16(&buf[4], be) != 8)) return false;

  uint64_t ifd = big ? rd64(&buf[8], be) : rd32(&buf[4], be);
  size_t entry_sz = big ? 20 : 12;
  if (ifd + (big ? 8 : 2) > uint64_t(sz)) return false;
  uint64_t n_entries = big ? rd64(&buf[ifd], be) : rd16(&buf[ifd], be);
  uint64_t entries_off = ifd + (big ? 8 : 2);
  if (entries_off + n_entries * entry_sz > uint64_t(sz)) return false;
  static const int kTypeSize[19] = {0, 1, 1, 2, 4, 8, 1, 1, 2, 4,
                                    8, 4, 8, 4, 0, 0, 8, 8, 8};

  auto get = [&](int want_tag, TiffTag* t) -> bool {
    for (uint64_t i = 0; i < n_entries; ++i) {
      const unsigned char* e = &buf[entries_off + entry_sz * i];
      if (rd16(e, be) != want_tag) continue;
      uint16_t type = rd16(e + 2, be);
      uint64_t count = big ? rd64(e + 4, be) : rd32(e + 4, be);
      if (type < 1 || type > 18 || !kTypeSize[type]) return false;
      uint64_t size = kTypeSize[type] * count;
      size_t inline_cap = big ? 8 : 4;
      const unsigned char* vp = big ? e + 12 : e + 8;
      uint64_t voff = size <= inline_cap
                          ? 0
                          : (big ? rd64(vp, be) : rd32(vp, be));
      if (size > inline_cap && voff + size > uint64_t(sz)) return false;
      const unsigned char* v = size <= inline_cap ? vp : &buf[voff];
      t->type = type;
      t->ivals.resize(count);
      for (uint64_t k = 0; k < count; ++k) {
        const unsigned char* p = v + size_t(k) * kTypeSize[type];
        switch (type) {
          case 1: case 2: case 6: case 7:  // byte-wide (incl. UNDEFINED)
            t->ivals[k] = *p;
            break;
          case 3: t->ivals[k] = rd16(p, be); break;
          case 4: case 13: t->ivals[k] = rd32(p, be); break;
          case 16: case 17: case 18: t->ivals[k] = rd64(p, be); break;
          default: t->ivals[k] = 0;
        }
      }
      return true;
    }
    return false;
  };
  auto get1 = [&](int tag, uint64_t dflt) -> uint64_t {
    TiffTag t;
    return get(tag, &t) && !t.ivals.empty() ? t.ivals[0] : dflt;
  };

  int width = int(get1(256, 0)), height = int(get1(257, 0));
  int spp = int(get1(277, 1)), bps = int(get1(258, 1));
  int comp = int(get1(259, 1)), planar = int(get1(284, 1));
  int sfmt = int(get1(339, 1)), pred = int(get1(317, 1));
  if (!width || !height) return false;
  if (comp != 1 && comp != 5 && comp != 7 && comp != 8 && comp != 32773 &&
      comp != 32946 && comp != 50000)
    return false;
  bool is_f32 = (sfmt == 3 && bps == 32);
  bool is_u16 = (sfmt == 1 && bps == 16);
  bool is_u8 = (sfmt == 1 && bps == 8);
  if (!is_f32 && !is_u16 && !is_u8) return false;
  if (pred != 1 && (pred != 2 || is_f32)) return false;
  if (comp == 7 && (!is_u8 || pred != 1)) return false;  // JPEG: 8-bit only
  int item = bps / 8;

  // JPEGTables (tag 347, UNDEFINED): shared tables for abbreviated streams
  std::vector<unsigned char> jpeg_tables;
  if (comp == 7) {
    TiffTag jt;
    if (get(347, &jt)) {
      jpeg_tables.reserve(jt.ivals.size());
      for (uint64_t v : jt.ivals) jpeg_tables.push_back((unsigned char)v);
    }
  }

  auto sample = [&](const unsigned char* p) -> float {
    if (is_u8) return float(*p);
    if (is_u16) return float(rd16(p, be));
    uint32_t bits = rd32(p, be);
    float v;
    std::memcpy(&v, &bits, 4);
    return v;
  };
  float scale = 1.0f;
  if ((is_u8 || is_u16) && dn_scale > 0) scale = 1.0f / dn_scale;

  out.assign(size_t(spp) * height * width, 0.0f);
  std::vector<unsigned char> seg;  // scratch, reused across segments
  TiffTag tile_offs;
  if (get(324, &tile_offs)) {  // tiled
    int tw = int(get1(322, 0)), tl = int(get1(323, 0));
    if (!tw || !tl) return false;
    TiffTag counts;
    bool have_counts = get(325, &counts);
    if (comp != 1 && !have_counts) return false;
    int tiles_x = (width + tw - 1) / tw, tiles_y = (height + tl - 1) / tl;
    int per = tiles_x * tiles_y;
    for (size_t t = 0; t < tile_offs.ivals.size(); ++t) {
      uint64_t off = tile_offs.ivals[t];
      uint64_t cnt = have_counts && t < counts.ivals.size() ? counts.ivals[t] : 0;
      int c0 = planar == 2 ? int(t) / per : 0;
      int rem = planar == 2 ? int(t) % per : int(t);
      int ty = rem / tiles_x, tx = rem % tiles_x;
      int csz = planar == 2 ? 1 : spp;
      size_t expect = size_t(tl) * tw * csz * item;
      const unsigned char* base;
      if (!decode_segment(buf, off, cnt, comp, pred, tw * csz, csz, item, be,
                          expect, seg, &base, &jpeg_tables))
        return false;
      for (int y = 0; y < tl && ty * tl + y < height; ++y)
        for (int x = 0; x < tw && tx * tw + x < width; ++x)
          for (int c = 0; c < csz; ++c) {
            const unsigned char* p =
                base + (size_t(y) * tw + x) * csz * item + size_t(c) * item;
            out[(size_t(c0 + c) * height + ty * tl + y) * width + tx * tw + x] =
                sample(p) * scale;
          }
    }
  } else {  // striped
    TiffTag offs;
    if (!get(273, &offs)) return false;
    TiffTag counts;
    bool have_counts = get(279, &counts);
    if (comp != 1 && !have_counts) return false;
    int rps = int(get1(278, height));
    int strips_per_plane = (height + rps - 1) / rps;
    for (size_t s = 0; s < offs.ivals.size(); ++s) {
      uint64_t off = offs.ivals[s];
      uint64_t cnt = have_counts && s < counts.ivals.size() ? counts.ivals[s] : 0;
      int c0 = planar == 2 ? int(s) / strips_per_plane : 0;
      int row0 = (planar == 2 ? int(s) % strips_per_plane : int(s)) * rps;
      int csz = planar == 2 ? 1 : spp;
      int n_rows = rps < height - row0 ? rps : height - row0;
      if (n_rows <= 0) continue;
      size_t expect = size_t(n_rows) * width * csz * item;
      const unsigned char* base;
      if (!decode_segment(buf, off, cnt, comp, pred, width * csz, csz, item,
                          be, expect, seg, &base, &jpeg_tables))
        return false;
      for (int y = 0; y < n_rows; ++y)
        for (int x = 0; x < width; ++x)
          for (int c = 0; c < csz; ++c) {
            const unsigned char* p =
                base + (size_t(y) * width + x) * csz * item + size_t(c) * item;
            out[(size_t(c0 + c) * height + row0 + y) * width + x] =
                sample(p) * scale;
          }
    }
  }
  *C = spp; *H = height; *W = width;
  return true;
}

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = std::strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i) {
    char a = s[s.size() - n + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
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
      bool ok = (has_suffix(paths[i], ".tif") || has_suffix(paths[i], ".tiff"))
                    ? read_tiff_chw(paths[i], raw, &C, &H, &W, dn_scale)
                    : read_npy_chw(paths[i], raw, &C, &H, &W, dn_scale);
      if (ok) {
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

}  // extern "C" — the template below needs C++ linkage; reopened after

// ---------------------------------------------------------------------------
// Whole-scene serving helpers (inference/scene.py): window cutting and
// plateau blending are single-threaded numpy host work that throttles the
// sliding-window pipeline on small hosts (scene e2e measured 10.4 win/s vs
// ~212 win/s compute-side, benchmarks/RESULTS.md round 4).  Both are pure
// memory ops — threads, no Python.

// Cut n tile²-windows out of a CHW scene into an NHWC batch buffer.
// pad: (C, Hp, Wp) row-major, itemsize ∈ {1, 2, 4} (u8/u16 DN or f32).
// wins: interleaved (y, x) origins.  out: (n, tile, tile, C), same dtype.
template <typename T>
static void scene_cut_typed(const T* pad, int C, int Hp, int Wp,
                            const int* wins, int n, int tile, T* out,
                            int n_threads) {
  (void)Hp;
  std::atomic<int> next{0};
  auto work = [&] {
    for (int b = next.fetch_add(1); b < n; b = next.fetch_add(1)) {
      const int y = wins[2 * b], x = wins[2 * b + 1];
      T* dst = out + size_t(b) * tile * tile * C;
      if (C == 3) {  // sequential writes, 3 sequential read streams
        for (int i = 0; i < tile; ++i) {
          const T* s0 = pad + (size_t(0) * Hp + (y + i)) * Wp + x;
          const T* s1 = pad + (size_t(1) * Hp + (y + i)) * Wp + x;
          const T* s2 = pad + (size_t(2) * Hp + (y + i)) * Wp + x;
          T* d = dst + size_t(i) * tile * 3;
          for (int j = 0; j < tile; ++j) {
            d[3 * j] = s0[j];
            d[3 * j + 1] = s1[j];
            d[3 * j + 2] = s2[j];
          }
        }
      } else {
        for (int i = 0; i < tile; ++i) {
          for (int c = 0; c < C; ++c) {
            const T* src = pad + (size_t(c) * Hp + (y + i)) * Wp + x;
            T* d = dst + (size_t(i) * tile) * C + c;
            for (int j = 0; j < tile; ++j) d[size_t(j) * C] = src[j];
          }
        }
      }
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < n_threads; ++t) ts.emplace_back(work);
  work();
  for (auto& t : ts) t.join();
}

extern "C" void tileio_scene_cut(const void* pad, int C, int Hp, int Wp,
                                 const int* wins, int n, int tile, void* out,
                                 int itemsize, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (itemsize == 4)
    scene_cut_typed(static_cast<const float*>(pad), C, Hp, Wp, wins, n, tile,
                    static_cast<float*>(out), n_threads);
  else if (itemsize == 2)
    scene_cut_typed(static_cast<const uint16_t*>(pad), C, Hp, Wp, wins, n,
                    tile, static_cast<uint16_t*>(out), n_threads);
  else
    scene_cut_typed(static_cast<const uint8_t*>(pad), C, Hp, Wp, wins, n,
                    tile, static_cast<uint8_t*>(out), n_threads);
}

// Accumulate n predicted windows into the (Hp, Wp) num/den planes with the
// separable plateau weight w1d (tile floats).  Row-stripe parallelism: each
// thread owns a contiguous band of OUTPUT rows and scans every window, so
// overlapping windows never race.
extern "C" void tileio_scene_blend(float* num, float* den, int Hp, int Wp,
                                   const float* preds, const int* wins, int n,
                                   int tile, const float* w1d, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  const int band = (Hp + n_threads - 1) / n_threads;
  auto work = [&] {
    for (int t = next.fetch_add(1); t * band < Hp; t = next.fetch_add(1)) {
      const int r0 = t * band, r1 = std::min(Hp, r0 + band);
      for (int b = 0; b < n; ++b) {
        const int y = wins[2 * b], x = wins[2 * b + 1];
        const int i0 = std::max(y, r0), i1 = std::min(y + tile, r1);
        for (int i = i0; i < i1; ++i) {
          const float wy = w1d[i - y];
          const float* p = preds + (size_t(b) * tile + (i - y)) * tile;
          float* nrow = num + size_t(i) * Wp + x;
          float* drow = den + size_t(i) * Wp + x;
          for (int j = 0; j < tile; ++j) {
            const float w = wy * w1d[j];
            nrow[j] += p[j] * w;
            drow[j] += w;
          }
        }
      }
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < n_threads; ++t) ts.emplace_back(work);
  work();
  for (auto& t : ts) t.join();
}

extern "C" {

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
