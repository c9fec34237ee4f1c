"""Magnetization dynamics: exact expm vs Chebyshev vs Krylov (parity with
examples/example.jl: L=14 nup=12 XXZ, Jxy=1, Jz=0.5, 200 steps to t=5).

The reference script as committed crashes at examples/example.jl:51 (undefined
`applyH!`); this port fixes that and runs end-to-end. Writes PNG heatmaps next
to this file when matplotlib is available.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import spindynamics_tpu as sd


def main(L=14, nup=12, Jxy=1.0, Jz=0.5, t_max=5.0, n_steps=200,
         cheb_n=10, kry_m=50, exact=None):
    dt = t_max / n_steps
    model = sd.xxz_chain(L, Jxy=Jxy, Jz=Jz, nup=nup, dtype=jnp.float64
                         if jax.config.read("jax_enable_x64") else jnp.float32)
    N = model.n_states
    print(f"L={L} nup={nup}  N={N}")
    mv = sd.matvec_fn(model)

    psi0 = sd.domain_wall_state(model, dtype=jnp.complex128
                                if jax.config.read("jax_enable_x64") else jnp.complex64)

    Emin, Emax = sd.estimate_energy_bounds(mv, N, lanc_m=60)
    print(f"Ebounds: [{Emin:.4f}, {Emax:.4f}]")
    coeffs = sd.chebyshev_coefficients(dt, Emin, Emax, cheb_n)

    if exact is None:
        exact = N <= 4096
    psi_exact = None
    if exact:
        import scipy.linalg

        H = sd.build_dense_H(model)
        U = scipy.linalg.expm(-1j * dt * H)
        psi_exact = np.asarray(psi0)

    mags_cheb, mags_kry, mags_exact, fid_cheb, fid_kry = [], [], [], [], []
    psi_c = psi0
    psi_k = psi0
    t0 = time.time()
    for step in range(n_steps):
        psi_c = sd.chebyshev_time_evolve(psi_c, mv, dt, (Emin, Emax),
                                         cheb_n=cheb_n, coeffs=coeffs)
        psi_k = sd.krylov_time_evolve(psi_k, mv, dt, kry_m=kry_m)
        mags_cheb.append(np.asarray(sd.magnetization_per_site(psi_c, model)))
        mags_kry.append(np.asarray(sd.magnetization_per_site(psi_k, model)))
        if psi_exact is not None:
            psi_exact = U @ psi_exact
            mags_exact.append(
                np.asarray(sd.magnetization_per_site(jnp.asarray(psi_exact), model))
            )
            fid_cheb.append(abs(np.vdot(psi_exact, np.asarray(psi_c))))
            fid_kry.append(abs(np.vdot(psi_exact, np.asarray(psi_k))))
    print(f"evolution: {time.time()-t0:.1f} s for {n_steps} steps x 2 engines")
    if fid_cheb:
        print(f"final fidelity vs exact: chebyshev {fid_cheb[-1]:.8f}, "
              f"krylov {fid_kry[-1]:.8f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3 if mags_exact else 2, figsize=(12, 4))
        for ax, (name, data) in zip(
            np.atleast_1d(axes),
            [("chebyshev", mags_cheb), ("krylov", mags_kry)]
            + ([("exact", mags_exact)] if mags_exact else []),
        ):
            im = ax.imshow(np.asarray(data).T, aspect="auto", origin="lower",
                           extent=[0, t_max, 0, L], cmap="RdBu_r")
            ax.set_title(name)
            ax.set_xlabel("t")
            ax.set_ylabel("site")
            fig.colorbar(im, ax=ax)
        out = __file__.replace(".py", f"_L{L}_nup{nup}.png")
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        print("wrote", out)
    except ImportError:
        pass
    return np.asarray(mags_cheb), np.asarray(mags_kry), (fid_cheb, fid_kry)


if __name__ == "__main__":
    main()
