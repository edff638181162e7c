// Native line-list preprocessing for transit_tpu.
//
// Three hot host-side loops that are interpreter-bound in Python at
// ExoMol scale (1e6..1e9 lines):
//
//  * group_partition: the sequential co-add chain partition of the exact
//    extinction path (mirrors the scalar loop structure of the reference's
//    computemolext pass 2, transit/src/extinction.c:430-462).  One linear
//    pass over the wavelength-sorted line list.
//
//  * argsort_iso_wl: stable O(n) argsort by (isotope, wavelength) — the
//    TLI sort contract — replacing np.lexsort for ingestion-scale sorts.
//
//  * parse_fixed_floats: bulk fixed-width ASCII float column parsing for
//    the HITRAN .par reader.
//
// Exposed as the CPython extension module transit_tpu._native (built via
// setup.py; transit_tpu falls back to the numpy/Python implementations
// when the extension is unavailable).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Buf {
  Py_buffer view{};
  bool ok = false;
  ~Buf() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* obj, const char* name) {
    if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO) != 0) {
      PyErr_Format(PyExc_TypeError, "%s: expected a contiguous buffer",
                   name);
      return false;
    }
    ok = true;
    return true;
  }
};

// group_partition(wavn f64[n], isoid i32[n], owns f64[onwn],
//                 wn_i, odwn, dwn, wn_top)
//   -> (gid i32[n], primary i32[ng], inrange u8[ng],
//       iown i64[ng], idwn i64[ng])
PyObject* group_partition(PyObject*, PyObject* args) {
  PyObject *wavn_o, *isoid_o, *owns_o;
  double wn_i, odwn, dwn, wn_top;
  if (!PyArg_ParseTuple(args, "OOOdddd", &wavn_o, &isoid_o, &owns_o, &wn_i,
                        &odwn, &dwn, &wn_top))
    return nullptr;

  Buf wavn_b, isoid_b, owns_b;
  if (!wavn_b.acquire(wavn_o, "wavn") || !isoid_b.acquire(isoid_o, "isoid") ||
      !owns_b.acquire(owns_o, "owns"))
    return nullptr;

  const double* wavn = static_cast<const double*>(wavn_b.view.buf);
  const int32_t* isoid = static_cast<const int32_t*>(isoid_b.view.buf);
  const double* owns = static_cast<const double*>(owns_b.view.buf);
  const Py_ssize_t n = wavn_b.view.len / (Py_ssize_t)sizeof(double);
  const Py_ssize_t onwn = owns_b.view.len / (Py_ssize_t)sizeof(double);
  if (isoid_b.view.len / (Py_ssize_t)sizeof(int32_t) != n) {
    PyErr_SetString(PyExc_ValueError, "wavn/isoid length mismatch");
    return nullptr;
  }

  std::vector<int32_t> gid(n);
  std::vector<int32_t> primary;
  std::vector<uint8_t> inrange;
  std::vector<int64_t> iown_v, idwn_v;
  primary.reserve(n / 2 + 1);

  Py_ssize_t i = 0;
  while (i < n) {
    const int32_t g = (int32_t)primary.size();
    const double w = wavn[i];
    gid[i] = g;
    primary.push_back((int32_t)i);
    if (w < wn_i || w > wn_top) {
      inrange.push_back(0);
      iown_v.push_back(0);
      idwn_v.push_back(0);
      ++i;
      continue;
    }
    int64_t iown = (int64_t)((w - wn_i) / odwn);  // C truncation, w >= wn_i
    if (iown + 1 < onwn &&
        std::fabs(w - owns[iown + 1]) < std::fabs(w - owns[iown]))
      ++iown;
    const double center = owns[iown];
    Py_ssize_t j = i + 1;
    while (j < n && isoid[j] == isoid[i] &&
           std::fabs(wavn[j] - center) < odwn) {
      gid[j] = g;
      ++j;
    }
    inrange.push_back(1);
    iown_v.push_back(iown);
    idwn_v.push_back((int64_t)((w - wn_i) / dwn));
    i = j;
  }

  const Py_ssize_t ng = (Py_ssize_t)primary.size();
  PyObject* gid_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(gid.data()), n * sizeof(int32_t));
  PyObject* prim_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(primary.data()), ng * sizeof(int32_t));
  PyObject* inr_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(inrange.data()), ng * sizeof(uint8_t));
  PyObject* iown_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(iown_v.data()), ng * sizeof(int64_t));
  PyObject* idwn_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(idwn_v.data()), ng * sizeof(int64_t));
  if (!gid_b || !prim_b || !inr_b || !iown_b || !idwn_b) return nullptr;
  return Py_BuildValue("(NNNNN)", gid_b, prim_b, inr_b, iown_b, idwn_b);
}

// argsort_iso_wl(isoid i32[n], wl f64[n]) -> i64[n] permutation bytes
//
// Stable argsort by (isoid, wl) — the TLI sort contract
// (pylineread.py:364-383: lines grouped by isotope, each isotope's lines
// ascending in wavelength).  Wavelengths are mapped through an
// order-preserving f64 -> u64 transform (negatives/zero handled; NaN
// canonicalized to the max key so NaNs sort last, matching np.lexsort),
// then sorted by an MSD bucket-partition hybrid (one scatter pass by the
// top varying bits, then an in-cache comparison sort per bucket — details
// at the partition below); finally one stable counting-sort pass on
// isoid.  ~O(n) vs np.lexsort's comparison sort — the 1e8..1e9-line
// ExoMol ingestion sort is the use case.
PyObject* argsort_iso_wl(PyObject*, PyObject* args) {
  PyObject *isoid_o, *wl_o;
  if (!PyArg_ParseTuple(args, "OO", &isoid_o, &wl_o)) return nullptr;

  Buf isoid_b, wl_b;
  if (!isoid_b.acquire(isoid_o, "isoid") || !wl_b.acquire(wl_o, "wl"))
    return nullptr;
  const int32_t* isoid = static_cast<const int32_t*>(isoid_b.view.buf);
  const double* wl = static_cast<const double*>(wl_b.view.buf);
  const Py_ssize_t n = wl_b.view.len / (Py_ssize_t)sizeof(double);
  if (isoid_b.view.len / (Py_ssize_t)sizeof(int32_t) != n) {
    PyErr_SetString(PyExc_ValueError, "isoid/wl length mismatch");
    return nullptr;
  }

  std::vector<uint64_t> key_a(n), key_b(n);
  std::vector<int64_t> idx_a(n), idx_b(n);
  // Order-preserving bijection f64 -> u64 (flip all bits for negatives,
  // just the sign bit for positives); +0.0 normalizes -0.0 so signed
  // zeros compare equal (stability then keeps original order, matching
  // np.lexsort).  NaNs (either sign) canonicalize to the max key so they
  // sort last, as np.lexsort does:
  for (Py_ssize_t i = 0; i < n; ++i) {
    const double v = wl[i] + 0.0;
    uint64_t k;
    if (std::isnan(v)) {
      k = ~UINT64_C(0);
    } else {
      std::memcpy(&k, &v, sizeof(k));
      k ^= (k >> 63) ? ~UINT64_C(0) : (UINT64_C(1) << 63);
    }
    key_a[i] = k;
    idx_a[i] = i;
  }

  // MSD hybrid: one scatter pass partitions by the top bits into buckets
  // sized to stay cache-resident, then each bucket is sorted in cache.
  // An LSD radix (7-8 passes over the full array) is memory-bandwidth
  // bound at 1e8+ lines on this host; this does ~3 full-array passes.
  // Bucket count targets ~4K elements/bucket (64KB of pairs), clamped to
  // [2^10, 2^20]; the digit is taken below the keys' common high-bit
  // prefix so narrow wavelength ranges still spread across buckets.
  uint64_t* ka = key_a.data();
  uint64_t* kb = key_b.data();
  int64_t* ia = idx_a.data();
  int64_t* ib = idx_b.data();
  if (n > 1) {
    uint64_t kmin = ka[0], kmax = ka[0];
    for (Py_ssize_t i = 1; i < n; ++i) {
      if (ka[i] < kmin) kmin = ka[i];
      if (ka[i] > kmax) kmax = ka[i];
    }
    int bits = 10;
    {
      double want = (double)n / 4096.0;
      while ((1 << bits) < want && bits < 20) ++bits;
    }
    const uint64_t range = kmax - kmin;
    // Highest varying bit:
    int top = 0;
    for (int b = 63; b >= 0; --b)
      if ((range >> b) & 1) { top = b + 1; break; }
    const int shift = top > bits ? top - bits : 0;
    const size_t nbuck = ((range >> shift) + 1);
    std::vector<int64_t> off(nbuck + 1, 0);
    for (Py_ssize_t i = 0; i < n; ++i)
      ++off[(size_t)((ka[i] - kmin) >> shift) + 1];
    for (size_t d = 1; d <= nbuck; ++d) off[d] += off[d - 1];
    std::vector<int64_t> cur(off.begin(), off.end() - 1);
    for (Py_ssize_t i = 0; i < n; ++i) {
      const int64_t dst = cur[(size_t)((ka[i] - kmin) >> shift)]++;
      kb[dst] = ka[i];
      ib[dst] = ia[i];
    }
    std::swap(ka, kb);
    std::swap(ia, ib);
    // Sort each bucket in cache; the index tiebreak makes it stable
    // (the scatter above preserved original order within a bucket):
    std::vector<std::pair<uint64_t, int64_t>> tmp;
    for (size_t d = 0; d < nbuck; ++d) {
      const int64_t lo = off[d], hi = off[d + 1];
      if (hi - lo < 2) continue;
      tmp.resize((size_t)(hi - lo));
      for (int64_t i = lo; i < hi; ++i)
        tmp[(size_t)(i - lo)] = {ka[i], ia[i]};
      std::sort(tmp.begin(), tmp.end());
      for (int64_t i = lo; i < hi; ++i) {
        ka[i] = tmp[(size_t)(i - lo)].first;
        ia[i] = tmp[(size_t)(i - lo)].second;
      }
    }
  }

  // Stable counting sort by isoid (read through the permutation):
  int32_t iso_min = 0, iso_max = 0;
  if (n > 0) {
    iso_min = iso_max = isoid[0];
    for (Py_ssize_t i = 1; i < n; ++i) {
      if (isoid[i] < iso_min) iso_min = isoid[i];
      if (isoid[i] > iso_max) iso_max = isoid[i];
    }
  }
  const size_t niso = (size_t)(iso_max - iso_min) + 1;
  if (niso > (size_t)1 << 22) {
    PyErr_SetString(PyExc_ValueError, "isoid range too large");
    return nullptr;
  }
  if (niso > 1) {
    std::vector<int64_t> off(niso + 1, 0);
    for (Py_ssize_t i = 0; i < n; ++i) ++off[(size_t)(isoid[i] - iso_min) + 1];
    for (size_t d = 1; d <= niso; ++d) off[d] += off[d - 1];
    for (Py_ssize_t i = 0; i < n; ++i) {
      const int64_t src = ia[i];
      ib[off[(size_t)(isoid[src] - iso_min)]++] = src;
    }
    std::swap(ia, ib);
  }

  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(ia),
                                   n * sizeof(int64_t));
}

// parse_fixed_floats(data bytes, recsize, offset, width, n) -> f64 bytes
PyObject* parse_fixed_floats(PyObject*, PyObject* args) {
  Py_buffer data;
  Py_ssize_t recsize, offset, width, n;
  if (!PyArg_ParseTuple(args, "y*nnnn", &data, &recsize, &offset, &width,
                        &n))
    return nullptr;
  const char* base = static_cast<const char*>(data.buf);
  if ((n - 1) * recsize + offset + width > data.len) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "buffer too small for n records");
    return nullptr;
  }
  std::vector<double> out(n);
  char tmp[64];
  for (Py_ssize_t k = 0; k < n; ++k) {
    const char* p = base + k * recsize + offset;
    Py_ssize_t w = width < 63 ? width : 63;
    std::memcpy(tmp, p, w);
    tmp[w] = '\0';
    out[k] = std::strtod(tmp, nullptr);
  }
  PyBuffer_Release(&data);
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(out.data()),
                                   n * sizeof(double));
}

PyMethodDef methods[] = {
    {"group_partition", group_partition, METH_VARARGS,
     "Co-add group partition of a sorted line list."},
    {"parse_fixed_floats", parse_fixed_floats, METH_VARARGS,
     "Parse a fixed-width ASCII float column from records."},
    {"argsort_iso_wl", argsort_iso_wl, METH_VARARGS,
     "Stable radix argsort by (isoid, wavelength)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native",
                      "Native host-side preprocessing for transit_tpu.",
                      -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&module); }
