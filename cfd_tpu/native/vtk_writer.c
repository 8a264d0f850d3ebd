/*
 * Native VTK / CSV formatting hot path.
 *
 * The reference's I/O layer is C (lib/src/io/vtk_output.c); the TPU-native
 * framework keeps the orchestration in Python but moves the byte-generation
 * hot loops (millions of printf-formatted values per snapshot) into this
 * small C library, loaded via ctypes with a pure-Python fallback.
 *
 * Formatting matches the reference exactly: "%f" fixed-point, one value (or
 * one "x y z" triple) per line, so files are byte-compatible with the C
 * library's writers.
 */

#include <stdio.h>
#include <stdint.h>
#include <string.h>

#ifdef _WIN32
#define EXPORT __declspec(dllexport)
#else
#define EXPORT __attribute__((visibility("default")))
#endif

/* Append n doubles to fp, one per line, "%f" format (vtk_output.c:149). */
EXPORT int cfd_write_scalars_f(FILE* fp, const double* data, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        if (fprintf(fp, "%f\n", data[i]) < 0) {
            return -1;
        }
    }
    return 0;
}

/* Append n vector triples "u v w" per line (vtk_output.c:190). */
EXPORT int cfd_write_vectors_f(FILE* fp, const double* u, const double* v,
                               const double* w, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        if (fprintf(fp, "%f %f %f\n", u[i], v[i], w ? w[i] : 0.0) < 0) {
            return -1;
        }
    }
    return 0;
}

/* File handle helpers so ctypes code never guesses the FILE* ABI. */
EXPORT FILE* cfd_fopen(const char* path, const char* mode) {
    return fopen(path, mode);
}

EXPORT int cfd_fputs(FILE* fp, const char* s) {
    return fputs(s, fp);
}

EXPORT int cfd_fclose(FILE* fp) {
    return fclose(fp);
}

/* CRC32 (IEEE reflected) over a buffer — same table-less formulation as the
 * reference checkpoint codec (checkpoint.c:41-50). */
EXPORT uint32_t cfd_crc32(uint32_t crc, const uint8_t* p, int64_t n) {
    crc ^= 0xFFFFFFFFu;
    for (int64_t i = 0; i < n; i++) {
        crc ^= p[i];
        for (int k = 0; k < 8; k++) {
            crc = (crc >> 1) ^ (0xEDB88320u & (0u - (crc & 1u)));
        }
    }
    return crc ^ 0xFFFFFFFFu;
}
