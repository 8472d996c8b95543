// Native string dictionary: C++ core for hdk_tpu's dictionary encoding.
//
// Reference: omniscidb/StringDictionary/StringDictionary.cpp — an
// append-only string<->int32 interning map with bulk encode as the
// import hot path (getOrAddBulk, StringDictionary.h:126).  This module
// provides the same core (unordered_map + arena of strings) behind a
// minimal CPython C API surface; hdk_tpu/storage/dictionary.py uses it
// when importable and falls back to pure Python otherwise.
//
// API (module hdk_tpu_native):
//   dict_new() -> capsule
//   dict_len(capsule) -> int
//   dict_get_or_add(capsule, str) -> int
//   dict_get_code(capsule, str) -> int            (-1 if absent)
//   dict_get_string(capsule, int) -> str
//   dict_bulk_get_or_add(capsule, list[str|None]) -> bytes (int32 codes)
//   dict_bulk_decode(capsule, bytes|memoryview of int32) -> list[str|None]
//   dict_all_strings(capsule) -> list[str]

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <deque>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t kNullCode = INT32_MIN;

struct StrDict {
  // deque: element addresses are stable under growth, so string_view
  // keys into the stored strings stay valid (a vector would move its
  // SSO strings on reallocation and dangle every map key)
  std::deque<std::string> strings;
  std::unordered_map<std::string_view, int32_t> codes;

  int32_t get_or_add(const char* data, Py_ssize_t len) {
    std::string_view key(data, static_cast<size_t>(len));
    auto it = codes.find(key);
    if (it != codes.end()) {
      return it->second;
    }
    strings.emplace_back(data, static_cast<size_t>(len));
    int32_t code = static_cast<int32_t>(strings.size() - 1);
    codes.emplace(std::string_view(strings.back()), code);
    return code;
  }
};

void destroy(PyObject* capsule) {
  delete static_cast<StrDict*>(PyCapsule_GetPointer(capsule, "hdk.StrDict"));
}

StrDict* unwrap(PyObject* capsule) {
  return static_cast<StrDict*>(PyCapsule_GetPointer(capsule, "hdk.StrDict"));
}

PyObject* dict_new(PyObject*, PyObject*) {
  return PyCapsule_New(new StrDict(), "hdk.StrDict", destroy);
}

PyObject* dict_len(PyObject*, PyObject* arg) {
  StrDict* d = unwrap(arg);
  if (!d) return nullptr;
  return PyLong_FromSsize_t(static_cast<Py_ssize_t>(d->strings.size()));
}

PyObject* dict_get_or_add(PyObject*, PyObject* args) {
  PyObject* cap;
  const char* s;
  Py_ssize_t len;
  if (!PyArg_ParseTuple(args, "Os#", &cap, &s, &len)) return nullptr;
  StrDict* d = unwrap(cap);
  if (!d) return nullptr;
  return PyLong_FromLong(d->get_or_add(s, len));
}

PyObject* dict_get_code(PyObject*, PyObject* args) {
  PyObject* cap;
  const char* s;
  Py_ssize_t len;
  if (!PyArg_ParseTuple(args, "Os#", &cap, &s, &len)) return nullptr;
  StrDict* d = unwrap(cap);
  if (!d) return nullptr;
  auto it = d->codes.find(std::string_view(s, static_cast<size_t>(len)));
  return PyLong_FromLong(it == d->codes.end() ? -1 : it->second);
}

PyObject* dict_get_string(PyObject*, PyObject* args) {
  PyObject* cap;
  long code;
  if (!PyArg_ParseTuple(args, "Ol", &cap, &code)) return nullptr;
  StrDict* d = unwrap(cap);
  if (!d) return nullptr;
  if (code < 0 || static_cast<size_t>(code) >= d->strings.size()) {
    PyErr_SetString(PyExc_IndexError, "string code out of range");
    return nullptr;
  }
  const std::string& s = d->strings[static_cast<size_t>(code)];
  return PyUnicode_FromStringAndSize(s.data(), static_cast<Py_ssize_t>(s.size()));
}

PyObject* dict_bulk_get_or_add(PyObject*, PyObject* args) {
  PyObject* cap;
  PyObject* seq;
  if (!PyArg_ParseTuple(args, "OO", &cap, &seq)) return nullptr;
  StrDict* d = unwrap(cap);
  if (!d) return nullptr;
  PyObject* fast = PySequence_Fast(seq, "expected a sequence");
  if (!fast) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * 4);
  if (!out) {
    Py_DECREF(fast);
    return nullptr;
  }
  int32_t* codes = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(fast, i);
    if (item == Py_None) {
      codes[i] = kNullCode;
      continue;
    }
    Py_ssize_t len;
    const char* s = PyUnicode_AsUTF8AndSize(item, &len);
    if (!s) {
      Py_DECREF(fast);
      Py_DECREF(out);
      return nullptr;
    }
    codes[i] = d->get_or_add(s, len);
  }
  Py_DECREF(fast);
  return out;
}

PyObject* dict_bulk_decode(PyObject*, PyObject* args) {
  PyObject* cap;
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "Oy*", &cap, &buf)) return nullptr;
  StrDict* d = unwrap(cap);
  if (!d) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  Py_ssize_t n = buf.len / 4;
  const int32_t* codes = static_cast<const int32_t*>(buf.buf);
  PyObject* out = PyList_New(n);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  for (Py_ssize_t i = 0; i < n; ++i) {
    int32_t c = codes[i];
    if (c == kNullCode || c < 0 ||
        static_cast<size_t>(c) >= d->strings.size()) {
      Py_INCREF(Py_None);
      PyList_SET_ITEM(out, i, Py_None);
    } else {
      const std::string& s = d->strings[static_cast<size_t>(c)];
      PyObject* u = PyUnicode_FromStringAndSize(
          s.data(), static_cast<Py_ssize_t>(s.size()));
      if (!u) {
        Py_DECREF(out);
        PyBuffer_Release(&buf);
        return nullptr;
      }
      PyList_SET_ITEM(out, i, u);
    }
  }
  PyBuffer_Release(&buf);
  return out;
}

PyObject* dict_all_strings(PyObject*, PyObject* arg) {
  StrDict* d = unwrap(arg);
  if (!d) return nullptr;
  PyObject* out = PyList_New(static_cast<Py_ssize_t>(d->strings.size()));
  if (!out) return nullptr;
  for (size_t i = 0; i < d->strings.size(); ++i) {
    PyObject* u = PyUnicode_FromStringAndSize(
        d->strings[i].data(), static_cast<Py_ssize_t>(d->strings[i].size()));
    if (!u) {
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, static_cast<Py_ssize_t>(i), u);
  }
  return out;
}

PyMethodDef methods[] = {
    {"dict_new", dict_new, METH_NOARGS, "create a dictionary"},
    {"dict_len", dict_len, METH_O, "entry count"},
    {"dict_get_or_add", dict_get_or_add, METH_VARARGS, "intern one string"},
    {"dict_get_code", dict_get_code, METH_VARARGS, "lookup, -1 if absent"},
    {"dict_get_string", dict_get_string, METH_VARARGS, "code -> string"},
    {"dict_bulk_get_or_add", dict_bulk_get_or_add, METH_VARARGS,
     "intern a sequence; returns int32 codes as bytes"},
    {"dict_bulk_decode", dict_bulk_decode, METH_VARARGS,
     "int32 code buffer -> list of str/None"},
    {"dict_all_strings", dict_all_strings, METH_O, "all strings in order"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "hdk_tpu_native",
                      "native core for hdk_tpu", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_hdk_tpu_native() { return PyModule_Create(&module); }
