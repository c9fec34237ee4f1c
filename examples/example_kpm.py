"""Local KPM autocorrelations C_ii(omega) and site-averaged spectral density
(parity with examples/example_kpm.jl: L=8 Sz=0 XXZ)."""

import jax
import jax.numpy as jnp
import numpy as np

import spindynamics_tpu as sd


def main(L=8, n_moments=200, n_omega=300):
    nup = L // 2
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    model = sd.xxz_chain(L, Jxy=1.0, Jz=0.5, nup=nup, dtype=dtype)
    mv = sd.matvec_fn(model)

    E0, psi0, _ = sd.lanczos_groundstate(mv, model.n_states, lanc_m=80, dtype=dtype)
    Emin, Emax = sd.estimate_energy_bounds(mv, model.n_states, lanc_m=60)
    a, b = sd.rescaling_params(Emin, Emax)
    print(f"E0 = {E0:.6f}, bounds [{Emin:.4f}, {Emax:.4f}]")

    # sparse/Arnoldi cross-check (parity with examples/example_kpm.jl:29-65:
    # sparse H from matvec columns + ArnoldiMethod partialschur): build H
    # column-by-column from the SAME matvec closure and compare E0/Emax
    # against scipy's implicitly restarted Arnoldi.
    try:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        N = model.n_states
        cols = [np.asarray(mv(jnp.zeros(N, dtype).at[j].set(1)))
                for j in range(N)]
        H = sp.csr_matrix(np.stack(cols, axis=1))
        e_lo = float(spla.eigsh(H, k=1, which="SA",
                                return_eigenvectors=False)[0])
        e_hi = float(spla.eigsh(H, k=1, which="LA",
                                return_eigenvectors=False)[0])
        print(f"Arnoldi cross-check: E0 {e_lo:.6f} (diff {abs(e_lo-E0):.2e}),"
              f" Emax {e_hi:.6f}")
        assert abs(e_lo - E0) < 1e-6 * max(1.0, abs(E0))
        assert e_hi <= Emax + 1e-8  # bounds must enclose the spectrum
    except ImportError:
        print("scipy unavailable; Arnoldi cross-check skipped")

    omega = np.linspace(Emin, Emax, n_omega)
    psi0c = jnp.asarray(np.asarray(psi0) + 0j)
    C_auto = []
    for i in range(L):
        op = sd.make_spin_operator(i, "z")
        S = np.asarray(
            sd.kpm_dynamical_correlation(psi0c, op, op, omega, model,
                                         n=n_moments, a=a, b=b)
        )
        C_auto.append(S)
    C_auto = np.asarray(C_auto)
    dos_avg = C_auto.mean(axis=0)
    print("site-averaged spectral weight:", float(np.trapezoid(dos_avg, omega)))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        for i in range(L):
            plt.plot(omega - E0, C_auto[i], alpha=0.4)
        plt.plot(omega - E0, dos_avg, "k-", lw=2, label="site average")
        plt.xlabel("omega - E0")
        plt.ylabel("C_ii(omega)")
        plt.legend()
        out = __file__.replace(".py", f"_L{L}.png")
        plt.tight_layout()
        plt.savefig(out, dpi=120)
        print("wrote", out)
    except ImportError:
        pass
    return C_auto


if __name__ == "__main__":
    main()
