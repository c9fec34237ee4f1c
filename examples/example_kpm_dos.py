"""BASELINE config #2: L=16 Sz=0 KPM density of states with 1024 Chebyshev
moments, cross-validated against the Lanczos spectrum from the same state."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import spindynamics_tpu as sd


def main(L=16, kpm_m=1024, lanc_m=200, n_omega=3000):
    # n_omega must resolve the Jackson width pi*a/kpm_m (~0.04): >= 2 pts/width
    nup = L // 2
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    model = sd.xxz_chain(L, Jxy=1.0, Jz=1.0, nup=nup, dtype=dtype)
    mv = sd.matvec_fn(model)
    print(f"L={L} Sz=0  N={model.n_states}")

    bounds = sd.estimate_energy_bounds(mv, model.n_states, lanc_m=100)
    a, b = sd.rescaling_params(*bounds)

    # local DOS of the Neel state: rho(w) = <Neel| delta(w - H) |Neel>
    psi = sd.neel_state(model, dtype=dtype)
    from functools import partial
    from spindynamics_tpu.ops.apply import apply_rescaled_H

    mvr = partial(apply_rescaled_H, model=model, a=a, b=b)
    t0 = time.time()
    mu = sd.chebyshev_moments(mvr, jnp.asarray(np.asarray(psi) + 0j), kpm_m,
                              doubling_trick=True)
    omega = np.linspace(bounds[0], bounds[1], n_omega)
    rho_kpm = np.asarray(sd.kpm_reconstruct(mu, omega, a, b, kernel="jackson",
                                            doubling=True, clamp=None,
                                            density_2_over_a=False)) / a
    t_kpm = time.time() - t0
    print(f"KPM {kpm_m} moments (doubling: {kpm_m // 2} matvecs): {t_kpm:.1f} s")

    # Lanczos spectrum of the same state. With 1024 moments the KPM resolution
    # (pi*a/M ~ 0.04) is far finer than lanc_m poles can represent pointwise,
    # so the meaningful cross-check is the CUMULATIVE spectral distribution
    # (integrated DOS), which both methods must agree on.
    t0 = time.time()
    alphas, betas, nrm = sd.lanczos_tridiag(mv, jnp.asarray(np.asarray(psi) + 0j),
                                            lanc_m=lanc_m)
    eta = np.pi * a / kpm_m
    rho_lanc = sd.spectral_from_tridiagonal(alphas, betas, float(nrm), 0.0,
                                            omega, eta=eta, broaden="gauss")
    print(f"Lanczos m={lanc_m}: {time.time() - t0:.1f} s")

    i_kpm = np.trapezoid(rho_kpm, omega)
    i_lanc = np.trapezoid(rho_lanc, omega)
    print(f"integrals: KPM {i_kpm:.4f}  Lanczos {i_lanc:.4f} (both ~ 1)")
    dw = omega[1] - omega[0]
    cum_k = np.cumsum(rho_kpm) * dw
    cum_l = np.cumsum(rho_lanc) * dw
    ks = np.abs(cum_k - cum_l).max()
    corr = np.corrcoef(rho_kpm, rho_lanc)[0, 1]
    print(f"cumulative-DOS max deviation (KS): {ks:.4f}; pointwise corr {corr:.3f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(7, 4))
        plt.plot(omega, rho_kpm, label=f"KPM ({kpm_m} moments, Jackson)")
        plt.plot(omega, rho_lanc, "--", label=f"Lanczos (m={lanc_m}, Gauss)")
        plt.xlabel("E")
        plt.ylabel("local DOS of |Neel>")
        plt.legend()
        out = __file__.replace(".py", f"_L{L}.png")
        plt.tight_layout()
        plt.savefig(out, dpi=120)
        print("wrote", out)
    except ImportError:
        pass
    return rho_kpm, rho_lanc, (i_kpm, i_lanc, ks)


if __name__ == "__main__":
    main()
