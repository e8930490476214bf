// Minimal CPython helper for the batch-parse hot path.
//
// The per-step FFI marshalling — extracting S buffer pointers + lengths
// from a list of bytes objects — costs ~170 us/step at S=256 through
// ctypes ((c_char_p * S)(*buffers) converts element-wise in Python-visible
// time).  This module does the same extraction in one C pass (~a few us),
// writing straight into the parser's preallocated uint64 arrays.
//
// Optional: bindings.py falls back to the ctypes path when this module is
// unavailable.  Built by bindings._build() alongside libh263entropy.so.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>

// gather_ptrs(buffers, ptrs_addr, lens_addr) -> None
//
// buffers: sequence of bytes objects (kept alive by the caller for the
// duration of the native call); ptrs_addr/lens_addr: addresses of
// uint64[n] arrays receiving each buffer's data pointer and length.
static PyObject* gather_ptrs(PyObject*, PyObject* args) {
  PyObject* seq;
  unsigned long long ptrs_addr, lens_addr;
  if (!PyArg_ParseTuple(args, "OKK", &seq, &ptrs_addr, &lens_addr))
    return nullptr;
  PyObject* fast = PySequence_Fast(seq, "buffers must be a sequence");
  if (!fast) return nullptr;
  uint64_t* ptrs = reinterpret_cast<uint64_t*>((uintptr_t)ptrs_addr);
  uint64_t* lens = reinterpret_cast<uint64_t*>((uintptr_t)lens_addr);
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject* b = PySequence_Fast_GET_ITEM(fast, i);  // borrowed
    char* data;
    Py_ssize_t len;
    if (PyBytes_AsStringAndSize(b, &data, &len) != 0) {
      Py_DECREF(fast);
      // Non-bytes element: the TypeError propagates to the caller.  The
      // batch parsers never trigger this — they convert every buffer to
      // bytes before calling (batch.py _prepare_sorenson_buffers /
      // parse_batch_packed_standard).
      return nullptr;
    }
    ptrs[i] = (uint64_t)(uintptr_t)data;
    lens[i] = (uint64_t)len;
  }
  Py_DECREF(fast);
  Py_RETURN_NONE;
}

static PyMethodDef kMethods[] = {
    {"gather_ptrs", gather_ptrs, METH_VARARGS,
     "Fill uint64 pointer/length arrays from a sequence of bytes objects."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "h263_fastcall",
    "C-pass FFI marshalling for the batch entropy parse.", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

PyMODINIT_FUNC PyInit_h263_fastcall(void) { return PyModule_Create(&kModule); }
