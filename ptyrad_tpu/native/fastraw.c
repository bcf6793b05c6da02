/* fastraw: multithreaded strided reader for EMPAD-style .raw stacks.
 *
 * Layout: `offset` junk bytes, then N frames of H*W little-endian values
 * (dtype itemsize `itemsize`), each frame followed by `gap` junk bytes
 * (1024 for EMPAD1; 0 for preprocessed EMPAD2 dumps).
 *
 * The Python reference path (numpy structured dtype + fromfile) is single-
 * threaded and copies through a temporary record array; this extension
 * pread()s frame spans directly into the destination buffer from `nthreads`
 * worker threads, which saturates page-cache / NVMe bandwidth for the
 * multi-GB stacks 4D-STEM produces.
 *
 * Exposed as ptyrad_tpu.native.fastraw.read_frames(path, n, h, w, itemsize,
 * offset, gap, nthreads) -> bytearray; the Python wrapper wraps it in an ndarray.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <errno.h>
#include <fcntl.h>
#include <pthread.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

typedef struct {
    const char *src;     /* mmap base */
    char *dst;
    int64_t frame_bytes;
    int64_t stride;      /* frame_bytes + gap */
    int64_t offset;
    int64_t start_frame;
    int64_t end_frame;
} ReadJob;

static void *read_worker(void *arg)
{
    /* mmap'd source: gap-stripping is pure memcpy, no per-frame syscalls */
    ReadJob *job = (ReadJob *)arg;
    for (int64_t f = job->start_frame; f < job->end_frame; ++f) {
        memcpy(job->dst + f * job->frame_bytes,
               job->src + job->offset + f * job->stride,
               (size_t)job->frame_bytes);
    }
    return NULL;
}

static PyObject *read_frames(PyObject *self, PyObject *args)
{
    const char *path;
    Py_ssize_t n, h, w, itemsize, offset, gap, nthreads;
    if (!PyArg_ParseTuple(args, "snnnnnnn", &path, &n, &h, &w, &itemsize,
                          &offset, &gap, &nthreads))
        return NULL;
    if (n <= 0 || h <= 0 || w <= 0 || itemsize <= 0 || offset < 0 || gap < 0)
        return PyErr_Format(PyExc_ValueError, "invalid raw geometry");
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 64) nthreads = 64;
    if (nthreads > n) nthreads = n;

    int64_t frame_bytes = (int64_t)h * w * itemsize;
    int64_t total = frame_bytes * n;

    /* bytearray, not bytes: np.frombuffer over a mutable buffer yields a
     * WRITABLE array, matching the NumPy fallback path (callers mutate
     * measurements in place, e.g. clipping negatives) */
    PyObject *out = PyByteArray_FromStringAndSize(NULL, (Py_ssize_t)total);
    if (!out)
        return NULL;
    char *dst = PyByteArray_AS_STRING(out);

    int fd = open(path, O_RDONLY);
    if (fd < 0) {
        Py_DECREF(out);
        return PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    }
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        Py_DECREF(out);
        return PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    }
    /* the last frame has no trailing gap: required span is
     * offset + n*stride - gap bytes; reject short files before mapping so a
     * wrong geometry (or a file truncated since the caller stat'd it) raises
     * instead of reading past the mapping and SIGSEGV'ing the interpreter */
    int64_t needed = offset + n * (frame_bytes + (int64_t)gap) - (int64_t)gap;
    if (needed > (int64_t)st.st_size) {
        close(fd);
        Py_DECREF(out);
        return PyErr_Format(PyExc_ValueError,
                            "raw file too small: need %lld bytes "
                            "(offset=%lld, %lld frames), have %lld",
                            (long long)needed, (long long)offset,
                            (long long)n, (long long)st.st_size);
    }
    char *src = (char *)mmap(NULL, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (src == MAP_FAILED) {
        Py_DECREF(out);
        return PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    }
    madvise(src, (size_t)st.st_size, MADV_SEQUENTIAL | MADV_WILLNEED);

    ReadJob jobs[64];
    pthread_t threads[64];
    int64_t per = (n + nthreads - 1) / nthreads;

    Py_BEGIN_ALLOW_THREADS
    Py_ssize_t started = 0;
    for (Py_ssize_t t = 0; t < nthreads; ++t) {
        jobs[t].src = src;
        jobs[t].dst = dst;
        jobs[t].frame_bytes = frame_bytes;
        jobs[t].stride = frame_bytes + gap;
        jobs[t].offset = offset;
        jobs[t].start_frame = t * per;
        jobs[t].end_frame = (t + 1) * per < n ? (t + 1) * per : n;
        if (pthread_create(&threads[t], NULL, read_worker, &jobs[t]) != 0) {
            /* thread spawn failed (EAGAIN under rlimit): run inline */
            read_worker(&jobs[t]);
            continue;
        }
        threads[started++] = threads[t];
    }
    for (Py_ssize_t t = 0; t < started; ++t)
        pthread_join(threads[t], NULL);
    Py_END_ALLOW_THREADS

    munmap(src, (size_t)st.st_size);
    return out;
}

static PyMethodDef methods[] = {
    {"read_frames", read_frames, METH_VARARGS,
     "read_frames(path, n, h, w, itemsize, offset, gap, nthreads) -> bytearray"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastraw", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_fastraw(void)
{
    return PyModule_Create(&moduledef);
}
