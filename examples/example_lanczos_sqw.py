"""Lanczos dynamic structure factor S(q, omega) (parity with
examples/example_lanczosSqw.jl: L=16 Sz=0 Heisenberg, lanc_m=100, eta=0.05)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import spindynamics_tpu as sd


def main(L=16, Jz=1.0, lanc_m=100, eta=0.05, n_omega=200, omega_max=4.0):
    nup = L // 2
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    model = sd.heisenberg_chain(L, J=1.0, nup=nup, dtype=dtype)
    mv = sd.matvec_fn(model)
    print(f"L={L} Sz=0  N={model.n_states}")

    t0 = time.time()
    E0, psi0, info = sd.lanczos_groundstate(mv, model.n_states, lanc_m=lanc_m,
                                            dtype=dtype)
    print(f"E0 = {E0:.8f}  (residual {info['residual']:.2e}, {time.time()-t0:.1f} s)")

    q_list = [2 * np.pi * k / L for k in range(L)]
    omega = np.linspace(0.0, omega_max, n_omega)
    t0 = time.time()
    S = sd.lanczos_sqw(psi0, model, q_list, omega, lanc_m=lanc_m, eta=eta)
    print(f"lanczos_sqw: {time.time()-t0:.1f} s for {len(q_list)} q-points")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        plt.imshow(S.T, aspect="auto", origin="lower",
                   extent=[0, 2 * np.pi, 0, omega_max], cmap="inferno")
        plt.xlabel("q")
        plt.ylabel("omega")
        plt.title(f"Lanczos S(q,w)  L={L} Sz=0 Heisenberg")
        plt.colorbar()
        out = __file__.replace(".py", f"_L{L}.png")
        plt.tight_layout()
        plt.savefig(out, dpi=120)
        print("wrote", out)
    except ImportError:
        pass
    return S, E0


if __name__ == "__main__":
    main()
