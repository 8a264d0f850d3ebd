/* Harness: write reference-library VTK files from deterministic data.
 * Usage: write_vtk <scalar.vtk> <vector.vtk> <field.vtk>
 * Data must match tests/interop/test_vtk_interop.py::_data exactly. */
#include <stdlib.h>

#include "cfd/io/vtk_output.h"
#include "cfd/solvers/navier_stokes_solver.h"

#define NX 7
#define NY 5
#define NZ 3

static double val(int which, size_t k, size_t j, size_t i) {
    return 0.25 * (double)which + 1.0 * (double)i + 10.0 * (double)j
           + 100.0 * (double)k - 3.5;
}

int main(int argc, char** argv) {
    if (argc < 4) return 2;
    size_t n = (size_t)NX * NY * NZ;
    double* a = malloc(n * sizeof(double));
    double* b = malloc(n * sizeof(double));
    double* c = malloc(n * sizeof(double));
    for (size_t k = 0; k < NZ; k++)
        for (size_t j = 0; j < NY; j++)
            for (size_t i = 0; i < NX; i++) {
                size_t idx = k * NX * NY + j * NX + i;
                a[idx] = val(0, k, j, i);
                b[idx] = val(1, k, j, i);
                c[idx] = val(2, k, j, i);
            }

    write_vtk_output(argv[1], "pressure", a, NX, NY, NZ,
                     0.0, 2.0, 0.0, 1.0, 0.0, 0.5);
    write_vtk_vector_output(argv[2], "velocity", a, b, c, NX, NY, NZ,
                            0.0, 2.0, 0.0, 1.0, 0.0, 0.5);

    flow_field* f = flow_field_create(NX, NY, NZ);
    if (!f) return 3;
    for (size_t idx = 0; idx < n; idx++) {
        f->u[idx] = a[idx];
        f->v[idx] = b[idx];
        f->w[idx] = c[idx];
        f->p[idx] = a[idx] * 2.0;
        f->rho[idx] = 1.0 + 0.01 * b[idx];
        f->T[idx] = 300.0 + c[idx];
    }
    write_vtk_flow_field(argv[3], f, NX, NY, NZ, 0.0, 2.0, 0.0, 1.0,
                         0.0, 0.5);
    return 0;
}
