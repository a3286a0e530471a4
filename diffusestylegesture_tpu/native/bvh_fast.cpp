// Fast BVH parser — native data-path accelerator.
//
// The reference's data layer is pure Python (its LMDB/h5 builders parse
// hundred-MB BVH files line by line: `anim/bvh.py:4-135`,
// `pymo/parsers.py:53-76`). This C++ parser feeds the same ChannelData
// structure ~40× faster: hierarchy scan + strtof-based frame matrix parse,
// exposed through a minimal C ABI consumed via ctypes
// (see `diffusestylegesture_tpu/native/__init__.py`).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 bvh_fast.cpp -o libbvh_fast.so

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Joint {
  std::string name;
  int parent;
  float offset[3];
  std::vector<std::string> channels;
};

struct ParseResult {
  std::vector<Joint> joints;
  std::vector<double> frames;  // T * C row-major (double: parity with the float64 Python/pymo parse)
  long num_frames = 0;
  long num_channels = 0;
  double frametime = 1.0 / 60.0;
  std::string channel_names;  // '\n'-joined "<joint>_<channel>"
  std::string joint_names;    // '\n'-joined
  std::vector<int> parents;
  std::vector<float> offsets;
  std::string error;
};

bool starts_with(const char* s, const char* prefix) {
  return std::strncmp(s, prefix, std::strlen(prefix)) == 0;
}

const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
  return p;
}

ParseResult* parse_file(const char* path) {
  auto* res = new ParseResult();
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    res->error = "cannot open file";
    return res;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    res->error = "short read";
    return res;
  }
  std::fclose(f);

  std::vector<int> stack;
  int current = -1;
  bool end_site = false;
  bool in_motion = false;
  long expected_frames = 0;

  const char* p = buf.data();
  const char* end = p + buf.size();

  while (p < end && !in_motion) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* l = skip_ws(p);

    if (starts_with(l, "ROOT") || starts_with(l, "JOINT")) {
      const char* name_start = skip_ws(l + (starts_with(l, "ROOT") ? 4 : 5));
      const char* name_end = name_start;
      while (name_end < line_end && *name_end != ' ' && *name_end != '\r' &&
             *name_end != '\t')
        ++name_end;
      Joint j;
      j.name.assign(name_start, name_end - name_start);
      // inline-brace declarations ('ROOT Hips {' / 'JOINT X{'): open the
      // scope here, matching the Python parser — otherwise OFFSET/CHANNELS
      // mis-target the parent joint
      bool inline_brace = false;
      if (!j.name.empty() && j.name.back() == '{') {
        j.name.pop_back();
        inline_brace = true;
      }
      if (!inline_brace && memchr(name_end, '{', line_end - name_end))
        inline_brace = true;
      j.parent = stack.empty() ? -1 : stack.back();
      j.offset[0] = j.offset[1] = j.offset[2] = 0;
      res->joints.push_back(j);
      current = static_cast<int>(res->joints.size()) - 1;
      if (inline_brace) stack.push_back(current);
    } else if (starts_with(l, "End Site")) {
      if (current < 0) { res->error = "malformed hierarchy"; return res; }
      end_site = true;
      Joint j;
      j.name = res->joints[current].name + "_Nub";
      j.parent = current;
      j.offset[0] = j.offset[1] = j.offset[2] = 0;
      res->joints.push_back(j);
      if (memchr(l + 8, '{', line_end - (l + 8)))  // 'End Site {'
        stack.push_back(static_cast<int>(res->joints.size()) - 1);
    } else if (*l == '{') {
      stack.push_back(end_site ? static_cast<int>(res->joints.size()) - 1
                               : current);
    } else if (*l == '}') {
      if (stack.empty()) { res->error = "malformed hierarchy"; return res; }
      int popped = stack.back();
      if (popped < 0) { res->error = "malformed hierarchy"; return res; }
      stack.pop_back();
      const std::string& nm = res->joints[popped].name;
      if (nm.size() >= 4 && nm.compare(nm.size() - 4, 4, "_Nub") == 0)
        end_site = false;
      current = stack.empty() ? -1 : stack.back();
    } else if (starts_with(l, "OFFSET")) {
      if (stack.empty()) { res->error = "malformed hierarchy"; return res; }
      char* q = const_cast<char*>(l + 6);
      int tgt = stack.back();
      if (tgt < 0) { res->error = "malformed hierarchy"; return res; }
      for (int i = 0; i < 3; ++i)
        res->joints[tgt].offset[i] = std::strtof(q, &q);
    } else if (starts_with(l, "CHANNELS")) {
      if (stack.empty()) { res->error = "malformed hierarchy"; return res; }
      char* q = const_cast<char*>(l + 8);
      long n = std::strtol(q, &q, 10);
      int tgt = stack.back();
      if (tgt < 0) { res->error = "malformed hierarchy"; return res; }
      for (long i = 0; i < n; ++i) {
        q = const_cast<char*>(skip_ws(q));
        const char* ws = q;
        while (ws < line_end && *ws != ' ' && *ws != '\r' && *ws != '\t') ++ws;
        res->joints[tgt].channels.emplace_back(q, ws - q);
        q = const_cast<char*>(ws);
      }
    } else if (starts_with(l, "Frames:")) {
      expected_frames = std::strtol(l + 7, nullptr, 10);
    } else if (starts_with(l, "Frame Time:")) {
      res->frametime = std::strtod(l + 11, nullptr);
      in_motion = true;
    }
    p = line_end + 1;
  }

  long C = 0;
  for (auto& j : res->joints) C += static_cast<long>(j.channels.size());
  res->num_channels = C;

  res->frames.reserve(static_cast<size_t>(expected_frames > 0 ? expected_frames : 1024) * C);
  // Fast fixed-format float parse: BVH motion lines are plain decimals
  // (sign, digits, '.', digits, optional e-exponent). ~5x strtod, which
  // dominates whole-file parse time on multi-MB mocap. Falls back to
  // strtod for anything unusual (hex, inf/nan, long mantissas).
  static const double kPow10[] = {1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7,
                                  1e8, 1e9, 1e10, 1e11, 1e12, 1e13, 1e14,
                                  1e15, 1e16, 1e17, 1e18};
  auto parse_fast = [&](char* s, const char* bound, char** next_out) -> double {
    char* start = s;
    while (s < bound && (*s == ' ' || *s == '\t' || *s == '\r')) ++s;
    if (s >= bound) {  // only whitespace left on this line: no token
      *next_out = start;  // no progress → caller stops this line
      return 0.0;
    }
    char* q0 = s;
    bool neg = false;
    if (*s == '-') { neg = true; ++s; }
    else if (*s == '+') ++s;
    unsigned long long mant = 0;
    int digits = 0, frac = 0;
    while (*s >= '0' && *s <= '9') {
      mant = mant * 10 + (unsigned)(*s - '0');
      ++digits; ++s;
    }
    if (*s == '.') {
      ++s;
      while (*s >= '0' && *s <= '9') {
        mant = mant * 10 + (unsigned)(*s - '0');
        ++digits; ++frac; ++s;
      }
    }
    if (digits == 0 || digits > 15) {
      // empty, or mantissa may exceed 2^53 (exactness no longer a single
      // correctly-rounded division) → strtod. If strtod also cannot parse
      // (endptr == q0), report NO progress — otherwise the caller would
      // record a spurious 0.0 and silently accept a corrupt line.
      char* e2 = nullptr;
      double dv = std::strtod(q0, &e2);
      if (e2 == q0) { *next_out = start; return 0.0; }
      *next_out = e2;
      return dv;
    }
    double v = (double)mant;
    if (*s == 'e' || *s == 'E') {
      ++s;
      bool eneg = false;
      if (*s == '-') { eneg = true; ++s; }
      else if (*s == '+') ++s;
      int ex = 0;
      while (*s >= '0' && *s <= '9') { ex = ex * 10 + (*s - '0'); ++s; }
      if (ex > 300) return std::strtod(q0, next_out);
      int total = eneg ? -(ex + frac) : (ex - frac);
      if (total >= 0) v *= (total < 19 ? kPow10[total] : std::pow(10.0, total));
      else v /= (-total < 19 ? kPow10[-total] : std::pow(10.0, -total));
    } else if (frac) {
      v /= kPow10[frac];
    }
    *next_out = s;
    return neg ? -v : v;
  };

  long T = 0;
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    char* q = const_cast<char*>(p);
    long cnt = 0;
    while (q < line_end) {
      char* next = q;
      double v = parse_fast(q, line_end, &next);
      if (next == q) break;  // no token (end of line / unparsable)
      res->frames.push_back(v);
      ++cnt;
      q = next;
    }
    if (cnt == C && C > 0) {
      ++T;
    } else if (cnt != 0) {
      // ragged/corrupt motion line: error out so the caller can fall back
      // to the Python parser, which raises on such input too
      res->error = "ragged motion line";
      return res;
    }
    p = line_end + 1;
  }
  res->num_frames = T;

  for (auto& j : res->joints) {
    res->joint_names += j.name;
    res->joint_names += '\n';
    res->parents.push_back(j.parent);
    res->offsets.push_back(j.offset[0]);
    res->offsets.push_back(j.offset[1]);
    res->offsets.push_back(j.offset[2]);
    for (auto& c : j.channels) {
      res->channel_names += j.name;
      res->channel_names += '_';
      res->channel_names += c;
      res->channel_names += '\n';
    }
  }
  return res;
}

}  // namespace

extern "C" {

void* bvh_parse(const char* path) { return parse_file(path); }

long bvh_num_frames(void* h) { return static_cast<ParseResult*>(h)->num_frames; }
long bvh_num_channels(void* h) { return static_cast<ParseResult*>(h)->num_channels; }
long bvh_num_joints(void* h) {
  return static_cast<long>(static_cast<ParseResult*>(h)->joints.size());
}
double bvh_frametime(void* h) { return static_cast<ParseResult*>(h)->frametime; }
const char* bvh_error(void* h) {
  auto* r = static_cast<ParseResult*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}
const char* bvh_channel_names(void* h) {
  return static_cast<ParseResult*>(h)->channel_names.c_str();
}
const char* bvh_joint_names(void* h) {
  return static_cast<ParseResult*>(h)->joint_names.c_str();
}
const int* bvh_parents(void* h) { return static_cast<ParseResult*>(h)->parents.data(); }
const float* bvh_offsets(void* h) { return static_cast<ParseResult*>(h)->offsets.data(); }
const double* bvh_values(void* h) { return static_cast<ParseResult*>(h)->frames.data(); }

void bvh_free(void* h) { delete static_cast<ParseResult*>(h); }

}  // extern "C"
