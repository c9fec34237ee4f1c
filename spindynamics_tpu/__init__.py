"""spindynamics_tpu — TPU-native exact-diagonalization spin-1/2 dynamics.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
Julia package javahedi/SpinDynamics.jl (mounted at /root/reference): bit-encoded
full/U(1)-sector bases, matrix-free XXZ Hamiltonian apply, Lanczos ground states
and spectral functions, KPM spectra and dynamical correlations, Chebyshev /
Krylov / RK4 / typicality time evolution, and diagonal observables — designed
for TPU (gather/flip matvec backends, lax.scan recurrences, vmapped q-batches,
sharded state vectors over a device mesh).

The flat namespace mirrors the reference's API root (src/SpinDynamics.jl:5-61).
"""

from .basis import (
    binomial_table,
    bit_at,
    build_full_basis,
    build_sector_basis,
    flip_bits,
    rank_state,
    rank_states,
    sector_dimension,
    sz_value,
    unrank,
)
from .model import SpinModel, build_model, long_range_hopping, nn_hopping
from .ops.apply import (
    apply_H,
    apply_H_dense,
    apply_H_ell,
    apply_H_tensor,
    apply_rescaled_H,
    build_dense_H,
    matvec_fn,
)
from .ops.spin_ops import (
    apply_spin_operator,
    make_spin_operator,
    sz_q_vector,
    sz_q_weights,
)
from .observables import (
    connected_correlations,
    magnetization_per_site,
    structure_factor_Sq,
    structure_factor_Sq_dict,
)
from .models.initial_states import (
    basis_state_vector,
    domain_wall_state,
    neel_state,
    polarized_state,
    polarized_state_with_flips,
    state_index,
)
from .models.xxz import heisenberg_chain, long_range_xy_chain, xxz_chain, xy_chain
from .solvers.lanczos import (
    estimate_energy_bounds,
    lanczos_extremal,
    lanczos_groundstate,
    lanczos_groundstate_restarted,
    lanczos_groundstate_twopass,
    lanczos_iteration,
    lanczos_tridiag,
)
from .solvers.chebyshev import (
    chebyshev_coefficients,
    chebyshev_moments,
    chebyshev_cross_moments,
    chebyshev_time_evolve,
    get_kernel,
    jackson_kernel,
    kpm_diagnostics,
    kpm_reconstruct,
    lorentz_kernel,
    rescaling_params,
)
from .solvers.krylov import (
    krylov_expm_multiply,
    krylov_imaginary_time_evolve,
    krylov_time_evolve,
)
from .solvers.lanczos_sqw import lanczos_sqw, spectral_from_tridiagonal
from .solvers.kpm import (
    kpm_correlation_matrix,
    kpm_dynamical_correlation,
    kpm_sqw,
    kpm_structure_factor,
    kpm_sw,
    run_kpm_dynamical,
)
from .solvers.runners import (
    evolve_trajectory,
    evolve_trajectory_planes,
    groundstate_kron,
    kpm_correlation_matrix_kron,
    kpm_sqw_kron,
    lanczos_groundstate_checkpointed,
    lanczos_sqw_kron,
    run_chebyshev,
    run_krylov,
)
from .solvers.typicality import (
    rk4_time_step,
    thermal_state,
    typicality_correlation_function,
)
from .observables_kron import (
    connected_correlations_kron,
    magnetization_per_site_kron,
    structure_factor_Sq_kron,
    szsz_matrix_kron,
)
from .solvers.blockvec import BlockVec, bv_basis_state, bv_random
from .solvers.kron_evolve import (
    chebyshev_imaginary_time_kron,
    chebyshev_time_evolve_kron,
    evolve_trajectory_kron,
    kron_energy_bounds,
    kron_planes_matvec_fn,
    krylov_imaginary_time_evolve_kron,
    krylov_time_evolve_kron,
    lanczos_tridiag_pair,
    typicality_correlation_kron,
)

__version__ = "0.1.0"
