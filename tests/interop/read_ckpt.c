/* Read a checkpoint (ours or the reference's) and print a digest. */
#include "cfd/io/checkpoint.h"
#include "cfd/core/grid.h"
#include "cfd/solvers/navier_stokes_solver.h"
#include <stdio.h>

int main(int argc, char** argv) {
    if (argc < 2) return 2;
    grid* g = NULL; flow_field* f = NULL;
    ns_solver_params_t p; double t = 0.0;
    char name[128], pfx[256], base[512];
    cfd_status_t st = cfd_checkpoint_read(argv[1], &g, &f, &p, &t, name,
                                          sizeof(name), pfx, sizeof(pfx),
                                          base, sizeof(base));
    if (st != CFD_SUCCESS) { printf("read status: %d\n", st); return 1; }
    double usum = 0, tsum = 0;
    for (size_t i = 0; i < g->nx * g->ny * g->nz; i++) {
        usum += f->u[i]; tsum += f->T[i];
    }
    printf("ok nx=%zu ny=%zu nz=%zu t=%.6f solver=%s prefix=%s base=%s "
           "dt=%.6f mu=%.6f alpha=%.6f beta=%.6f tbc_left=%d tbc_lv=%.1f "
           "usum=%.10f Tsum=%.10f\n",
           g->nx, g->ny, g->nz, t, name, pfx, base, p.dt, p.mu, p.alpha,
           p.beta, (int)p.thermal_bc.left, p.thermal_bc.dirichlet_values.left,
           usum, tsum);
    return 0;
}
