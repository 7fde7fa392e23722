// Exact oriented-3D-box intersection-over-union, C ABI.
//
// Native counterpart of eval/box3d.py (which replaces the reference's
// vendored objectron NumPy/SciPy implementation, third-party/objectron/
// dataset/iou.py:22-33). The NOCS evaluation sweeps 18 y-rotations per frame
// (eval_utils.py:141-178), so the exact IoU is the eval hot loop.
//
// Algorithm: the boundary of the intersection of two convex polytopes A, B
// is exactly (faces of A clipped to B) + (faces of B clipped to A), all
// outward-oriented. Clipping is 3D Sutherland-Hodgman per half-space; the
// volume follows from the divergence theorem over the closed triangulated
// boundary — no convex-hull code needed.
//
// Box layout matches eval/box3d.UNIT_CORNERS: 9 rows x 3 (center + 8
// corners, (x,y,z) signs ordered z-fastest).

#include <array>
#include <cmath>
#include <cstddef>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 operator-(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
inline Vec3 operator+(const Vec3& a, const Vec3& b) {
  return {a.x + b.x, a.y + b.y, a.z + b.z};
}
inline Vec3 operator*(const Vec3& a, double s) {
  return {a.x * s, a.y * s, a.z * s};
}
inline double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline double norm(const Vec3& a) { return std::sqrt(dot(a, a)); }

using Polygon = std::vector<Vec3>;

struct HalfSpace {  // inside: dot(n, x) <= d
  Vec3 n;
  double d;
};

struct Box {
  Vec3 v[9];  // center + 8 corners

  Vec3 axis(int k) const {  // unit axes from corner frame
    Vec3 e;
    switch (k) {
      case 0: e = v[5] - v[1]; break;  // +x edge
      case 1: e = v[3] - v[1]; break;  // +y edge
      default: e = v[2] - v[1]; break; // +z edge
    }
    double n = norm(e);
    return e * (n > 0 ? 1.0 / n : 0.0);
  }

  double half_extent(int k) const {
    Vec3 e = (k == 0) ? v[5] - v[1] : (k == 1) ? v[3] - v[1] : v[2] - v[1];
    return 0.5 * norm(e);
  }

  double volume() const {
    return 8.0 * half_extent(0) * half_extent(1) * half_extent(2);
  }

  std::array<HalfSpace, 6> halfspaces() const {
    std::array<HalfSpace, 6> hs;
    for (int k = 0; k < 3; ++k) {
      Vec3 a = axis(k);
      double c = dot(a, v[0]);
      double h = half_extent(k);
      hs[2 * k] = {a, c + h};
      hs[2 * k + 1] = {{-a.x, -a.y, -a.z}, -c + h};
    }
    return hs;
  }

  // 6 outward-oriented (CCW from outside) quad faces
  std::array<Polygon, 6> faces() const {
    // corner indices (1-based into v) per face, wound outward assuming a
    // right-handed corner frame; orientation is fixed up below for
    // left-handed inputs.
    static const int F[6][4] = {
        {1, 2, 4, 3},  // -x
        {5, 7, 8, 6},  // +x
        {1, 5, 6, 2},  // -y
        {3, 4, 8, 7},  // +y
        {1, 3, 7, 5},  // -z
        {2, 6, 8, 4},  // +z
    };
    // handedness: x . (y cross z)
    double h = dot(axis(0), cross(axis(1), axis(2)));
    std::array<Polygon, 6> out;
    for (int f = 0; f < 6; ++f) {
      Polygon p(4);
      for (int i = 0; i < 4; ++i) p[i] = v[F[f][h >= 0 ? i : 3 - i]];
      out[f] = p;
    }
    return out;
  }
};

Polygon clip(const Polygon& poly, const HalfSpace& hs, double eps = 1e-12) {
  if (poly.empty()) return poly;
  Polygon out;
  size_t n = poly.size();
  std::vector<double> d(n);
  for (size_t i = 0; i < n; ++i) d[i] = dot(poly[i], hs.n) - hs.d;
  for (size_t i = 0; i < n; ++i) {
    size_t j = (i + 1) % n;
    if (d[i] <= eps) out.push_back(poly[i]);
    bool crosses = (d[i] < -eps && d[j] > eps) || (d[i] > eps && d[j] < -eps);
    if (crosses) {
      double t = d[i] / (d[i] - d[j]);
      out.push_back(poly[i] + (poly[j] - poly[i]) * t);
    }
  }
  return out;
}

// signed volume contribution of one outward-oriented boundary polygon
double polygon_volume_term(const Polygon& p) {
  double acc = 0.0;
  for (size_t i = 1; i + 1 < p.size(); ++i) {
    acc += dot(p[0], cross(p[i], p[i + 1]));
  }
  return acc / 6.0;
}

double intersection_volume(const Box& a, const Box& b) {
  double vol = 0.0;
  // Scale-relative tolerances: upstream boxes carry float32-level noise
  // (~1e-7 relative), so clipping must treat near-coplanar geometry as
  // coplanar. Coplanar faces (e.g. identical boxes) would be counted once
  // per box; shrinking A's half-spaces by delta > eps on the B pass drops
  // B's copy of any shared boundary face, perturbing volume only at
  // O(delta * area).
  double scale = 0.0;
  for (int k = 0; k < 3; ++k) scale += a.half_extent(k) + b.half_extent(k);
  double eps = 3e-7 * scale;
  double delta = 3e-6 * scale;
  auto hs_a_shrunk = a.halfspaces();
  for (auto& h : hs_a_shrunk) h.d -= delta;

  for (const auto& f : a.faces()) {
    Polygon p = f;
    for (const auto& h : b.halfspaces()) {
      p = clip(p, h, eps);
      if (p.size() < 3) { p.clear(); break; }
    }
    if (p.size() >= 3) vol += polygon_volume_term(p);
  }
  for (const auto& f : b.faces()) {
    Polygon p = f;
    for (const auto& h : hs_a_shrunk) {
      p = clip(p, h, eps);
      if (p.size() < 3) { p.clear(); break; }
    }
    if (p.size() >= 3) vol += polygon_volume_term(p);
  }
  return vol > 0 ? vol : 0.0;
}

Box load_box(const double* v9x3) {
  Box b;
  for (int i = 0; i < 9; ++i) {
    b.v[i] = {v9x3[3 * i], v9x3[3 * i + 1], v9x3[3 * i + 2]};
  }
  return b;
}

}  // namespace

extern "C" {

double box3d_iou(const double* verts_a, const double* verts_b) {
  Box a = load_box(verts_a);
  Box b = load_box(verts_b);
  double inter = intersection_volume(a, b);
  double uni = a.volume() + b.volume() - inter;
  if (uni <= 0.0) return 0.0;
  double iou = inter / uni;
  return iou < 0 ? 0 : (iou > 1 ? 1 : iou);
}

// n pairs -> n IoUs
void box3d_iou_batch(const double* boxes_a, const double* boxes_b,
                     int n, double* out) {
  for (int i = 0; i < n; ++i) {
    out[i] = box3d_iou(boxes_a + 27 * i, boxes_b + 27 * i);
  }
}

// one predicted box against n candidate GT boxes; returns max IoU
double box3d_iou_max(const double* box_pred, const double* boxes_gt, int n) {
  double best = 0.0;
  for (int i = 0; i < n; ++i) {
    double v = box3d_iou(box_pred, boxes_gt + 27 * i);
    if (v > best) best = v;
  }
  return best;
}

}  // extern "C"
