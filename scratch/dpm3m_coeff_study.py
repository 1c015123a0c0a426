"""Which third-order D2 coefficient is actually right for DPM-Solver++(3M)?

Canonical implementations (diffusers DPMSolverMultistepScheduler third-order
update; k-diffusion sample_dpmpp_3m_sde at eta=0; Lu et al.'s dpm_solver repo)
all use   c2 = -((e^{-h}-1+h)/h^2 - 1/2)   on
          D2 = (D1_0 - D1_1)/(r0+r1).
Direct quadrature algebra on the exponential integrator
  x(t) = e^{-h} x(s) + \int_0^h e^{v-h} x0(lambda_s + v) dv
says exact integration of a QUADRATIC x0(lambda) needs exactly TWICE that
weight:  c2_exact = (h^2 - 2h + 2 - 2e^{-h})/h^2  (since D2 = h^2 x0''/2
exactly, for any step ratios). This script measures empirical convergence
order of both variants on a smooth nontrivial ODE and on a synthetic ODE
whose x0(lambda) is an exact cubic polynomial (where a true 3rd-order
method must be exact up to rounding).
"""
import numpy as np


def make_sigmas(n, smin=0.03, smax=14.6, rho=7.0):
    ramp = np.linspace(0, 1, n)
    inv = smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))
    return np.concatenate([inv ** rho, [0.0]])


def run_3m(x0_fn, n, x_init, d2_mode="exact", order_cap=3, stop_before_jump=False):
    """Multistep solver in k-sigma space; x0_fn(x, sigma) -> x0 prediction.

    stop_before_jump: return x at sigma_min, BEFORE the final sigma->0 jump
    (the jump lands on x0(sigma_min) for every solver, hiding integration
    error — required for the polynomial exactness test).
    """
    sig = make_sigmas(n)
    x = np.array(x_init, np.float64) * sig[0]
    m1 = m2 = np.zeros_like(x)
    lam = -np.log(sig[:-1])
    n_steps = n - 1 if stop_before_jump else n
    for i in range(n_steps):
        s, s_next = sig[i], sig[i + 1]
        m0 = x0_fn(x, s)
        r = s_next / s
        if i == n - 1 or s_next == 0:
            x = r * x + (1 - r) * m0
        else:
            h = lam[i + 1] - lam[i]
            order = min(order_cap, i + 1, 3)
            if order == 1:
                x = r * x + (1 - r) * m0
            elif order == 2:
                h0 = lam[i] - lam[i - 1]
                r0 = h0 / h
                d1_0 = (m0 - m1) / r0
                x = r * x + (1 - r) * (m0 + 0.5 * d1_0)
            else:
                h0 = lam[i] - lam[i - 1]
                h1 = lam[i - 1] - lam[i - 2]
                r0, r1 = h0 / h, h1 / h
                d1_0 = (m0 - m1) / r0
                d1_1 = (m1 - m2) / r1
                d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                c1 = (h + r - 1.0) / h
                if d2_mode == "exact":
                    c2 = (h * h - 2 * h + 2 - 2 * r) / (h * h)
                else:  # canonical
                    c2 = 0.5 - (r - 1.0 + h) / (h * h)
                x = r * x + (1 - r) * m0 + c1 * d1 + c2 * d2
        m2, m1 = m1, m0
    return x


# --- Test 1: synthetic ODE with polynomial x0(lambda) ------------------
# x0(lambda) = a + b*lam + c*lam^2 (quadratic): a true 3rd-order multistep
# update must integrate this EXACTLY once it has 2 history points.
A, B, C = 0.4, -0.13, 0.027


def poly_x0(_x, sigma):
    lam = -np.log(sigma)
    return A + B * lam + C * lam ** 2


def exact_poly_solution(n):
    """Exact x at sigma_min (BEFORE the sigma->0 jump): the lambda-space ODE
    dx/dlam = x - x0(lam)... in DPM++ data-prediction form the exact
    propagator is x(l1) = e^{-(l1-l0)} x(l0) + int_{l0}^{l1} e^{u-l1} x0(u) du,
    closed-form for quadratic x0."""
    sig = make_sigmas(n)
    lam0, lam1 = -np.log(sig[0]), -np.log(sig[-2])
    x = 1.7 * sig[0]

    def F(u):  # antiderivative of e^u (A + B u + C u^2)
        return np.exp(u) * (A + B * (u - 1) + C * (u ** 2 - 2 * u + 2))
    integral = (F(lam1) - F(lam0)) * np.exp(-lam1)
    return np.exp(-(lam1 - lam0)) * x + integral


# NOTE: compare at sigma_min BEFORE the final jump — the sigma->0 step maps
# x to x0(sigma_min) for every solver, which would hide all integration error.
for n in (8, 12, 20):
    truth = exact_poly_solution(n)
    kw = dict(stop_before_jump=True)
    e_exact = abs(run_3m(poly_x0, n, 1.7, "exact", **kw) - truth)
    e_canon = abs(run_3m(poly_x0, n, 1.7, "canonical", **kw) - truth)
    e_2m = abs(run_3m(poly_x0, n, 1.7, "exact", order_cap=2, **kw) - truth)
    print(f"poly  n={n:3d}  2M={e_2m:.3e}  3M-canon={e_canon:.3e}  "
          f"3M-exact={e_exact:.3e}")

# --- Test 2: smooth nontrivial ODE (tanh denoiser), convergence order ---


def tanh_x0(x, _sigma):
    return np.tanh(x)


def fine_truth(n_fine=400000):
    sig = make_sigmas(8)
    grid = make_sigmas(n_fine)[:-1]
    x = np.array([1.7, -0.9, 0.3, 2.4]) * sig[0]
    for i in range(len(grid) - 1):
        eps = (x - np.tanh(x)) / grid[i]
        x = x + eps * (grid[i + 1] - grid[i])
    return np.tanh(x)


gt = fine_truth()
print()
prev = {}
for n in (6, 10, 14, 20, 28, 40, 60):
    row = {}
    for mode, cap in (("2M", 2), ("3M-canon", 3), ("3M-exact", 3)):
        d2 = "canonical" if mode == "3M-canon" else "exact"
        err = np.abs(run_3m(tanh_x0, n, np.array([1.7, -0.9, 0.3, 2.4]),
                            d2, order_cap=cap) - gt).max()
        row[mode] = err
    ords = {k: (np.log(prev[k] / row[k]) / np.log((n) / (prev_n)))
            if prev else float("nan") for k in row}
    print(f"tanh  n={n:3d}  " + "  ".join(
        f"{k}={row[k]:.3e}(p={ords[k]:.2f})" for k in row))
    prev, prev_n = row, n
