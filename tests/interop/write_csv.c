/* Harness: write reference-library CSV files from deterministic data.
 * Usage: write_csv <ts.csv> <cl_h.csv> <cl_v.csv> <st.csv>
 * Data must match tests/interop/test_csv_interop.py::_state exactly. */
#include <stdlib.h>

#include "cfd/core/derived_fields.h"
#include "cfd/io/csv_output.h"
#include "cfd/solvers/navier_stokes_solver.h"

#define NX 9
#define NY 6

static double val(int which, size_t j, size_t i) {
    return 0.125 * (double)which + 0.5 * (double)i - 0.25 * (double)j
           + 0.0625;
}

int main(int argc, char** argv) {
    if (argc < 5) return 2;
    flow_field* f = flow_field_create(NX, NY, 1);
    if (!f) return 3;
    for (size_t j = 0; j < NY; j++)
        for (size_t i = 0; i < NX; i++) {
            size_t idx = j * NX + i;
            f->u[idx] = val(0, j, i);
            f->v[idx] = val(1, j, i);
            f->w[idx] = 0.0;
            f->p[idx] = val(2, j, i);
            f->rho[idx] = 1.0 + 0.001 * val(3, j, i);
            f->T[idx] = 300.0 + val(4, j, i);
        }

    derived_fields* d = derived_fields_create(NX, NY, 1);
    derived_fields_compute_velocity_magnitude(d, f);
    derived_fields_compute_statistics(d, f);

    ns_solver_params_t params = ns_solver_params_default();
    params.dt = 0.0025;
    ns_solver_stats_t stats;
    stats.iterations = 42;
    stats.residual = 3.5e-4;
    stats.elapsed_time_ms = 1.75;

    write_csv_timeseries(argv[1], 0, 0.0, f, d, &params, &stats,
                         NX, NY, 1);
    stats.iterations = 43;
    write_csv_timeseries(argv[1], 1, 0.0025, f, d, &params, &stats,
                         NX, NY, 0);

    double x[NX], y[NY];
    for (size_t i = 0; i < NX; i++) x[i] = 2.0 * (double)i / (NX - 1);
    for (size_t j = 0; j < NY; j++) y[j] = 1.0 * (double)j / (NY - 1);
    write_csv_centerline(argv[2], f, d, x, y, NX, NY, PROFILE_HORIZONTAL);
    write_csv_centerline(argv[3], f, d, x, y, NX, NY, PROFILE_VERTICAL);

    write_csv_statistics(argv[4], 0, 0.0, f, d, NX, NY, 1);
    write_csv_statistics(argv[4], 5, 0.0125, f, d, NX, NY, 0);
    return 0;
}
