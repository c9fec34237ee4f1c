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
