/* Write a reference-library checkpoint for interop testing. */
#include "cfd/io/checkpoint.h"
#include "cfd/core/grid.h"
#include "cfd/solvers/navier_stokes_solver.h"
#include <stdio.h>
#include <stdlib.h>

int main(int argc, char** argv) {
    if (argc < 2) return 2;
    grid* g = grid_create(8, 6, 1, 0.0, 2.0, 0.0, 1.0, 0.0, 0.0);
    grid_initialize_uniform(g);
    flow_field* f = flow_field_create(8, 6, 1);
    initialize_flow_field(f, g);
    ns_solver_params_t p = ns_solver_params_default();
    p.dt = 0.002; p.mu = 0.05; p.alpha = 0.1; p.beta = 0.01; p.T_ref = 300.0;
    p.gravity[1] = -9.81;
    p.thermal_bc.left = BC_TYPE_DIRICHLET;
    p.thermal_bc.dirichlet_values.left = 350.0;
    cfd_status_t st = cfd_checkpoint_write(argv[1], g, f, &p, 1.25,
                                           "projection", "runpfx", "/tmp/base");
    printf("write status: %d\n", st);
    return st == CFD_SUCCESS ? 0 : 1;
}
