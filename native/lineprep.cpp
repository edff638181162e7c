// Native line-list preprocessing for transit_tpu.
//
// Two hot host-side loops that are interpreter-bound in Python at
// ExoMol scale (1e6..1e9 lines):
//
//  * group_partition: the sequential co-add chain partition of the exact
//    extinction path (mirrors the scalar loop structure of the reference's
//    computemolext pass 2, transit/src/extinction.c:430-462).  One linear
//    pass over the wavelength-sorted line list.
//
//  * parse_fixed_floats: bulk fixed-width ASCII float column parsing for
//    the HITRAN .par reader.
//
// Exposed as the CPython extension module transit_tpu._native (built via
// setup.py; transit_tpu falls back to the numpy/Python implementations
// when the extension is unavailable).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

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
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native",
                      "Native host-side preprocessing for transit_tpu.",
                      -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&module); }
