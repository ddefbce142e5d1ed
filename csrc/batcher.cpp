// siss_tpu native data plane: multi-threaded batch assembly.
//
// The reference's data path is torch DataLoader with 0 workers (synchronous
// Python). Here the hot host-side transform — gather N uint8 images by
// index, convert to float32, normalize to [-1, 1] ("ToTensor + Normalize"),
// write one contiguous NHWC batch — runs in C++ with a thread pool,
// releasing the GIL so it overlaps TPU compute and the Python loop.
//
// Exposed via the CPython C API (no pybind11 in this image):
//   batcher.assemble(images_u8 /*[N,H,W,C] uint8, C-contig*/,
//                    indices    /*[B] int64*/,
//                    normalize  /*bool*/) -> float32 ndarray [B,H,W,C]
//
// Built by scripts/build_native.py (setuptools); siss_tpu.data.loader
// falls back to numpy when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Buffer {
    Py_buffer view{};
    bool ok = false;
    ~Buffer() {
        if (ok) PyBuffer_Release(&view);
    }
};

void convert_rows(const uint8_t* src, const int64_t* idx, float* dst,
                  size_t n_items, size_t item_elems, bool normalize,
                  std::atomic<size_t>* cursor) {
    const float scale = normalize ? (2.0f / 255.0f) : 1.0f;
    const float shift = normalize ? -1.0f : 0.0f;
    for (;;) {
        size_t i = cursor->fetch_add(1);
        if (i >= n_items) return;
        const uint8_t* s = src + static_cast<size_t>(idx[i]) * item_elems;
        float* d = dst + i * item_elems;
        for (size_t j = 0; j < item_elems; ++j) {
            d[j] = static_cast<float>(s[j]) * scale + shift;
        }
    }
}

PyObject* assemble(PyObject*, PyObject* args) {
    PyObject* images_obj;
    PyObject* indices_obj;
    int normalize = 1;
    if (!PyArg_ParseTuple(args, "OO|p", &images_obj, &indices_obj, &normalize)) {
        return nullptr;
    }

    Buffer images, indices;
    if (PyObject_GetBuffer(images_obj, &images.view,
                           PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
        return nullptr;
    }
    images.ok = true;
    if (PyObject_GetBuffer(indices_obj, &indices.view,
                           PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
        return nullptr;
    }
    indices.ok = true;

    if (images.view.itemsize != 1) {
        PyErr_SetString(PyExc_TypeError, "images must be uint8");
        return nullptr;
    }
    if (indices.view.itemsize != 8) {
        PyErr_SetString(PyExc_TypeError, "indices must be int64");
        return nullptr;
    }
    if (images.view.ndim < 2) {
        PyErr_SetString(PyExc_ValueError, "images must be [N, ...]");
        return nullptr;
    }

    const size_t n_src = static_cast<size_t>(images.view.shape[0]);
    size_t item_elems = 1;
    for (int d = 1; d < images.view.ndim; ++d) {
        item_elems *= static_cast<size_t>(images.view.shape[d]);
    }
    const size_t batch = static_cast<size_t>(indices.view.len / 8);
    const auto* idx = static_cast<const int64_t*>(indices.view.buf);
    for (size_t i = 0; i < batch; ++i) {
        if (idx[i] < 0 || static_cast<size_t>(idx[i]) >= n_src) {
            PyErr_SetString(PyExc_IndexError, "index out of range");
            return nullptr;
        }
    }

    // Build the output through numpy's C API-free path: allocate a
    // bytearray-backed memoryview is awkward; instead create via numpy.
    PyObject* np = PyImport_ImportModule("numpy");
    if (!np) return nullptr;
    PyObject* empty = PyObject_GetAttrString(np, "empty");
    Py_DECREF(np);
    if (!empty) return nullptr;

    PyObject* shape = PyTuple_New(images.view.ndim);
    PyTuple_SET_ITEM(shape, 0, PyLong_FromSize_t(batch));
    for (int d = 1; d < images.view.ndim; ++d) {
        PyTuple_SET_ITEM(shape, d, PyLong_FromLongLong(images.view.shape[d]));
    }
    PyObject* out = PyObject_CallFunction(empty, "Os", shape, "float32");
    Py_DECREF(shape);
    Py_DECREF(empty);
    if (!out) return nullptr;

    Buffer outbuf;
    if (PyObject_GetBuffer(out, &outbuf.view, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE) != 0) {
        Py_DECREF(out);
        return nullptr;
    }
    outbuf.ok = true;

    const auto* src = static_cast<const uint8_t*>(images.view.buf);
    auto* dst = static_cast<float*>(outbuf.view.buf);
    const bool norm = normalize != 0;

    Py_BEGIN_ALLOW_THREADS;
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 4;
    if (n_threads > batch) n_threads = static_cast<unsigned>(batch ? batch : 1);
    std::atomic<size_t> cursor{0};
    std::vector<std::thread> pool;
    for (unsigned t = 1; t < n_threads; ++t) {
        pool.emplace_back(convert_rows, src, idx, dst, batch, item_elems, norm, &cursor);
    }
    convert_rows(src, idx, dst, batch, item_elems, norm, &cursor);
    for (auto& th : pool) th.join();
    Py_END_ALLOW_THREADS;

    return out;
}

PyMethodDef methods[] = {
    {"assemble", assemble, METH_VARARGS,
     "assemble(images_u8, indices_i64, normalize=True) -> float32 batch"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_siss_batcher",
                      "native batch assembly", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__siss_batcher() { return PyModule_Create(&module); }
