// Native PLY codec — fast host-side parse/serialize for the TPU pipeline.
//
// C++ replacement for the reference's stream-based parser/serializer
// (reference: tmc3/ply.cpp:88-504, a per-point ifs.read loop).  This
// implementation is a fresh design for bulk throughput:
//   * binary bodies: one fread + strided column extraction (no
//     per-point virtual calls);
//   * ascii bodies: single buffer scan with strtod, no per-line
//     tokenizer allocations;
//   * output: positions quantized to int32 (value * scale, truncated
//     toward zero — the reference's double→int32_t conversion,
//     tmc3/ply.cpp:407-409) and colors in the internal (g, b, r)
//     channel order (tmc3/ply.cpp:412-414).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
// Build: make -C buildingsegment_tpu/native
//
// Thread-free by design: the codec is called from Python once per file;
// parallelism comes from processing many scans, not many threads here.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

enum PropKind : int32_t {
  PROP_OTHER = 0,
  PROP_X,
  PROP_Y,
  PROP_Z,
  PROP_RED,
  PROP_GREEN,
  PROP_BLUE,
  PROP_REFLECTANCE,
  PROP_FRAMEINDEX,
  PROP_LASERANGLE,
};

struct Prop {
  PropKind kind;
  int type_size;   // bytes
  char type_code;  // 'f' float, 'u' unsigned, 'i' signed
};

struct Header {
  bool ascii = false;
  bool big_endian = false;
  int64_t vertex_count = 0;
  int64_t body_offset = 0;
  std::vector<Prop> props;
  bool ok = false;
  std::string error;
};

bool starts_with(const char* line, const char* prefix) {
  return std::strncmp(line, prefix, std::strlen(prefix)) == 0;
}

// parse one header line worth of tokens (whitespace separated)
int tokenize(char* line, char** toks, int max_toks) {
  int n = 0;
  char* save = nullptr;
  for (char* t = strtok_r(line, " \t\r\n", &save);
       t && n < max_toks;
       t = strtok_r(nullptr, " \t\r\n", &save)) {
    toks[n++] = t;
  }
  return n;
}

bool prop_type(const char* name, int* size, char* code) {
  struct Entry { const char* n; int s; char c; };
  static const Entry table[] = {
      {"float64", 8, 'f'}, {"double", 8, 'f'}, {"float", 4, 'f'},
      {"float32", 4, 'f'}, {"uint64", 8, 'u'}, {"uint32", 4, 'u'},
      {"uint16", 2, 'u'},  {"uchar", 1, 'u'},  {"uint8", 1, 'u'},
      {"int64", 8, 'i'},   {"int32", 4, 'i'},  {"int16", 2, 'i'},
      {"char", 1, 'i'},    {"int8", 1, 'i'},
  };
  for (const auto& e : table) {
    if (std::strcmp(name, e.n) == 0) {
      *size = e.s;
      *code = e.c;
      return true;
    }
  }
  return false;
}

PropKind classify(const char* name, int size, char code) {
  // mirror the reference's accepted name/size combinations
  // (tmc3/ply.cpp:328-369)
  if ((size == 4 || size == 8) && code == 'f') {
    if (!std::strcmp(name, "x")) return PROP_X;
    if (!std::strcmp(name, "y")) return PROP_Y;
    if (!std::strcmp(name, "z")) return PROP_Z;
  }
  if (size == 1 && code == 'u') {
    if (!std::strcmp(name, "red")) return PROP_RED;
    if (!std::strcmp(name, "green")) return PROP_GREEN;
    if (!std::strcmp(name, "blue")) return PROP_BLUE;
  }
  if (size <= 2 && code != 'f') {
    if (!std::strcmp(name, "reflectance") || !std::strcmp(name, "refc"))
      return PROP_REFLECTANCE;
    if (!std::strcmp(name, "frameindex")) return PROP_FRAMEINDEX;
  }
  // any scalar type (numpy parser: np.round(...).astype(int32))
  if (!std::strcmp(name, "laserangle")) return PROP_LASERANGLE;
  return PROP_OTHER;
}

Header parse_header(FILE* f) {
  Header h;
  char line[4096];
  char* toks[8];

  if (!fgets(line, sizeof line, f)) { h.error = "empty file"; return h; }
  {
    char tmp[4096];
    std::strcpy(tmp, line);
    int n = tokenize(tmp, toks, 8);
    if (n < 1 || std::strcmp(toks[0], "ply") != 0) {
      h.error = "missing ply magic";
      return h;
    }
  }
  bool in_vertex = true;
  while (fgets(line, sizeof line, f)) {
    if (starts_with(line, "end_header")) {
      h.body_offset = ftell(f);
      h.ok = true;
      return h;
    }
    char tmp[4096];
    std::strcpy(tmp, line);
    int n = tokenize(tmp, toks, 8);
    if (n == 0 || std::strcmp(toks[0], "comment") == 0) continue;
    if (std::strcmp(toks[0], "format") == 0 && n == 3) {
      h.ascii = std::strcmp(toks[1], "ascii") == 0;
      h.big_endian = std::strcmp(toks[1], "binary_big_endian") == 0;
      if (std::strtod(toks[2], nullptr) != 1.0) {
        h.error = "unsupported version";
        return h;
      }
    } else if (std::strcmp(toks[0], "element") == 0 && n == 3) {
      if (std::strcmp(toks[1], "vertex") == 0) {
        h.vertex_count = std::atoll(toks[2]);
        in_vertex = true;
      } else {
        in_vertex = false;
      }
    } else if (std::strcmp(toks[0], "property") == 0 && in_vertex) {
      if (n != 3) { h.error = "bad property"; return h; }
      if (std::strcmp(toks[1], "list") == 0) {
        h.error = "list property unsupported";
        return h;
      }
      int size;
      char code;
      if (!prop_type(toks[1], &size, &code)) {
        h.error = "unknown type";
        return h;
      }
      h.props.push_back({classify(toks[2], size, code), size, code});
    }
  }
  h.error = "truncated header";
  return h;
}

inline uint64_t byteswap(uint64_t v, int size) {
  switch (size) {
    case 2: return __builtin_bswap16((uint16_t)v);
    case 4: return __builtin_bswap32((uint32_t)v);
    case 8: return __builtin_bswap64(v);
    default: return v;
  }
}

inline double read_scalar(const uint8_t* p, int size, char code, bool swap) {
  uint64_t raw = 0;
  std::memcpy(&raw, p, size);
  if (swap) raw = byteswap(raw, size);
  if (code == 'f') {
    if (size == 4) {
      float f;
      uint32_t r32 = (uint32_t)raw;
      std::memcpy(&f, &r32, 4);
      return f;
    }
    double d;
    std::memcpy(&d, &raw, 8);
    return d;
  }
  if (code == 'u') return (double)raw;
  // sign-extend
  switch (size) {
    case 1: return (double)(int8_t)raw;
    case 2: return (double)(int16_t)raw;
    case 4: return (double)(int32_t)raw;
    default: return (double)(int64_t)raw;
  }
}

}  // namespace

extern "C" {

// Inspect the file: returns 0 on success and fills counts/flags.
// flags bit0: has_colors, bit1: has_reflectance, bit2: has_frameindex,
// bit3: has_laserangle.  All four attribute sets are extracted by
// bst_ply_read (matching the numpy parser's dtype semantics), so
// attribute-rich scans stay on the native fast path.
int bst_ply_info(const char* path, int64_t* count, int32_t* flags) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h = parse_header(f);
  std::fclose(f);
  if (!h.ok) return -2;
  *count = h.vertex_count;
  bool r = false, g = false, b = false, refl = false, fi = false,
       la = false;
  for (const auto& p : h.props) {
    if (p.kind == PROP_RED) r = true;
    if (p.kind == PROP_GREEN) g = true;
    if (p.kind == PROP_BLUE) b = true;
    if (p.kind == PROP_REFLECTANCE) refl = true;
    if (p.kind == PROP_FRAMEINDEX) fi = true;
    if (p.kind == PROP_LASERANGLE) la = true;
  }
  *flags = ((r && g && b) ? 1 : 0) | (refl ? 2 : 0) | (fi ? 4 : 0) |
           (la ? 8 : 0);
  return 0;
}

// Read positions (quantized int32, trunc-toward-zero of value*scale) and
// optional attributes: colors (uint16, internal g,b,r order),
// reflectance (uint16), frameindex (uint8, modulo cast — matching the
// numpy parser's astype(uint8)) and laserangle (int32, rounded —
// matching np.round().astype(int32)).  Buffers must hold `count` rows
// (from bst_ply_info); any out pointer may be null.
int bst_ply_read(const char* path, double scale, int32_t* pos_out,
                 uint16_t* color_out, uint16_t* refl_out,
                 uint8_t* fi_out, int32_t* la_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h = parse_header(f);
  if (!h.ok) { std::fclose(f); return -2; }
  const int64_t n = h.vertex_count;

  if (h.ascii) {
    // slurp the body, single strtod scan
    fseek(f, 0, SEEK_END);
    long end = ftell(f);
    fseek(f, h.body_offset, SEEK_SET);
    std::vector<char> buf(end - h.body_offset + 1);
    size_t got = fread(buf.data(), 1, buf.size() - 1, f);
    buf[got] = '\0';
    std::fclose(f);
    char* p = buf.data();
    char* bufend = buf.data() + got;
    const int np = (int)h.props.size();
    for (int64_t i = 0; i < n; ++i) {
      // one record per line, like the reference's getline loop
      // (tmc3/ply.cpp:395-429): a short line is a parse error, not a
      // silent misalignment of every following column
      while (p < bufend &&
             (*p == '\n' || *p == '\r' || *p == ' ' || *p == '\t'))
        ++p;
      if (p >= bufend) return -3;  // fewer records than declared
      char* eol = (char*)std::memchr(p, '\n', bufend - p);
      if (eol == nullptr) eol = bufend;
      for (int a = 0; a < np; ++a) {
        char* next = nullptr;
        double v = std::strtod(p, &next);
        if (next == p || next > eol) {
          return -3;  // short line: defer to the strict numpy parser
        }
        p = next;
        switch (h.props[a].kind) {
          case PROP_X: pos_out[i * 3 + 0] = (int32_t)(v * scale); break;
          case PROP_Y: pos_out[i * 3 + 1] = (int32_t)(v * scale); break;
          case PROP_Z: pos_out[i * 3 + 2] = (int32_t)(v * scale); break;
          case PROP_GREEN:
            if (color_out) color_out[i * 3 + 0] = (uint16_t)v;
            break;
          case PROP_BLUE:
            if (color_out) color_out[i * 3 + 1] = (uint16_t)v;
            break;
          case PROP_RED:
            if (color_out) color_out[i * 3 + 2] = (uint16_t)v;
            break;
          case PROP_REFLECTANCE:
            if (refl_out) refl_out[i] = (uint16_t)v;
            break;
          case PROP_FRAMEINDEX:
            if (fi_out) fi_out[i] = (uint8_t)(int64_t)v;
            break;
          case PROP_LASERANGLE:
            if (la_out) la_out[i] = (int32_t)std::nearbyint(v);
            break;
          default: break;
        }
      }
      p = eol;  // ignore any extra tokens on the line
    }
    return 0;
  }

  // binary: bulk-read the body, strided extraction
  int stride = 0;
  for (const auto& p : h.props) stride += p.type_size;
  std::vector<uint8_t> body((size_t)n * stride);
  fseek(f, h.body_offset, SEEK_SET);
  size_t got = fread(body.data(), 1, body.size(), f);
  std::fclose(f);
  int64_t avail = (int64_t)(got / stride);
  if (avail > n) avail = n;

#if __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
  const bool swap = !h.big_endian;
#else
  const bool swap = h.big_endian;
#endif

  int off = 0;
  for (const auto& prop : h.props) {
    const uint8_t* base = body.data() + off;
    off += prop.type_size;
    if (prop.kind == PROP_OTHER) continue;
    for (int64_t i = 0; i < avail; ++i) {
      double v = read_scalar(base + (size_t)i * stride, prop.type_size,
                             prop.type_code, swap);
      switch (prop.kind) {
        case PROP_X: pos_out[i * 3 + 0] = (int32_t)(v * scale); break;
        case PROP_Y: pos_out[i * 3 + 1] = (int32_t)(v * scale); break;
        case PROP_Z: pos_out[i * 3 + 2] = (int32_t)(v * scale); break;
        case PROP_GREEN:
          if (color_out) color_out[i * 3 + 0] = (uint16_t)v;
          break;
        case PROP_BLUE:
          if (color_out) color_out[i * 3 + 1] = (uint16_t)v;
          break;
        case PROP_RED:
          if (color_out) color_out[i * 3 + 2] = (uint16_t)v;
          break;
        case PROP_REFLECTANCE:
          if (refl_out) refl_out[i] = (uint16_t)v;
          break;
        case PROP_FRAMEINDEX:
          if (fi_out) fi_out[i] = (uint8_t)(int64_t)v;
          break;
        case PROP_LASERANGLE:
          if (la_out) la_out[i] = (int32_t)std::nearbyint(v);
          break;
        default: break;
      }
    }
  }
  return 0;
}

// Write a binary-little-endian PLY with the reference's exact layout
// (header: float64 x/y/z, uchar green/blue/red, element face 0 —
// tmc3/ply.cpp:103-139; body: double[3] + uint8[3] per point,
// tmc3/ply.cpp:164-182).  positions are int32, written as
// pos*scale+offset in float64.  Optional attribute columns follow the
// numpy writer byte-for-byte: refc uint16; frameindex declared uint8
// in the header but a uint16 body word (the reference's own
// header/body mismatch, tmc3/ply.cpp:134-136 vs :178-181); laserangle
// int32 (container-preserving extension — the reference's writer
// drops it).
int bst_ply_write(const char* path, const int32_t* pos,
                  const uint16_t* colors, const uint16_t* refl,
                  const uint8_t* fi, const int32_t* la, int64_t n,
                  double scale, double off_x, double off_y, double off_z) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "ply\nformat binary_little_endian 1.0\n");
  std::fprintf(f, "element vertex %lld\n", (long long)n);
  std::fprintf(f,
               "property float64 x\nproperty float64 y\nproperty float64 z\n");
  if (colors)
    std::fprintf(
        f, "property uchar green\nproperty uchar blue\nproperty uchar red\n");
  if (refl) std::fprintf(f, "property uint16 refc\n");
  if (fi) std::fprintf(f, "property uint8 frameindex\n");
  if (la) std::fprintf(f, "property int32 laserangle\n");
  std::fprintf(f, "element face 0\n");
  std::fprintf(f, "property list uint8 int32 vertex_index\n");
  std::fprintf(f, "end_header\n");

  const int rec = 24 + (colors ? 3 : 0) + (refl ? 2 : 0) + (fi ? 2 : 0) +
                  (la ? 4 : 0);
  std::vector<uint8_t> buf((size_t)n * rec);
  const double off[3] = {off_x, off_y, off_z};
  for (int64_t i = 0; i < n; ++i) {
    uint8_t* p = buf.data() + (size_t)i * rec;
    for (int k = 0; k < 3; ++k) {
      double v = pos[i * 3 + k] * scale + off[k];
      std::memcpy(p + k * 8, &v, 8);
    }
    p += 24;
    if (colors) {
      p[0] = (uint8_t)colors[i * 3 + 0];
      p[1] = (uint8_t)colors[i * 3 + 1];
      p[2] = (uint8_t)colors[i * 3 + 2];
      p += 3;
    }
    if (refl) {
      std::memcpy(p, &refl[i], 2);
      p += 2;
    }
    if (fi) {
      const uint16_t w = fi[i];  // uint16 on the wire (see above)
      std::memcpy(p, &w, 2);
      p += 2;
    }
    if (la) {
      std::memcpy(p, &la[i], 4);
      p += 4;
    }
  }
  size_t wrote = fwrite(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return wrote == buf.size() ? 0 : -3;
}

// PNG scanline defilter (spec filters 0-4).  The decoder's cold path
// for foreign PNGs: Sub/Average/Paeth carry a left-pixel dependency
// that cannot vectorize in numpy, so the per-byte recurrence runs here
// (the reference links stb_image for decode; our encoder itself only
// emits filter 0).  `raw` holds h scanlines, each 1 filter byte +
// stride bytes; `out` receives h*stride recon bytes.  Returns 0, or
// -1 on an out-of-spec filter tag.
int bst_png_defilter(const uint8_t* raw, int64_t h, int64_t stride,
                     int64_t bpp, uint8_t* out) {
  const uint8_t* prev = nullptr;
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* line = raw + y * (stride + 1);
    const uint8_t filt = line[0];
    ++line;
    uint8_t* o = out + y * stride;
    switch (filt) {
      case 0:
        std::memcpy(o, line, stride);
        break;
      case 1:  // Sub
        for (int64_t i = 0; i < stride; ++i)
          o[i] = (uint8_t)(line[i] + (i >= bpp ? o[i - bpp] : 0));
        break;
      case 2:  // Up
        for (int64_t i = 0; i < stride; ++i)
          o[i] = (uint8_t)(line[i] + (prev ? prev[i] : 0));
        break;
      case 3:  // Average
        for (int64_t i = 0; i < stride; ++i) {
          const int a = i >= bpp ? o[i - bpp] : 0;
          const int b = prev ? prev[i] : 0;
          o[i] = (uint8_t)(line[i] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (int64_t i = 0; i < stride; ++i) {
          const int a = i >= bpp ? o[i - bpp] : 0;
          const int b = prev ? prev[i] : 0;
          const int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
          const int p = a + b - c;
          const int pa = p > a ? p - a : a - p;
          const int pb = p > b ? p - b : b - p;
          const int pc = p > c ? p - c : c - p;
          const int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          o[i] = (uint8_t)(line[i] + pred);
        }
        break;
      default:
        return -1;
    }
    prev = o;
  }
  return 0;
}

}  // extern "C"
