"""Stochastic Runge–Kutta tableaus.

Four-stage SRI scheme for diagonal-noise Itô SDEs (Rößler 2010, SIAM J.
Numer. Anal. 48 — the SRIW1 coefficient set), the generic structure behind
the reference's ``FourStageSRIConstantCache`` step
(``src/perform_step.jl:49-106``).

Documented deviation: the reference's default SDE solver is StochasticDiffEq's
stability-optimized SOSRI tableau; its (decimal) coefficients are not
re-derivable here, so the classical SRIW1 tableau (exact rationals, same
structure, same strong order 1.5 / weak order 2) fills the role. A
strong-convergence test validates order empirically.
"""
from __future__ import annotations


class SRIW1Tableau:
    """Rößler SRIW1: strong order 1.5 for diagonal/commutative Itô noise.

    Stage structure (s = 4):
      H⁰ᵢ = u + dt·Σ A⁰ᵢⱼ kⱼ + χ₂·Σ B⁰ᵢⱼ gⱼ
      H¹ᵢ = u + dt·Σ A¹ᵢⱼ kⱼ + √dt·Σ B¹ᵢⱼ gⱼ
      u⁺  = u + dt·Σ αᵢ kᵢ + dW·Σ β₁ᵢ gᵢ + χ₁·Σ β₂ᵢ gᵢ + χ₂·Σ β₃ᵢ gᵢ + χ₃·Σ β₄ᵢ gᵢ
    with χ₁ = (dW² − dt)/(2√dt), χ₂ = (dW + dZ/√3)/2, χ₃ = (dW³ − 3·dW·dt)/(6·dt).
    """

    order = 1.5

    # drift stage coefficients (A0 strictly lower triangular, nonzeros only)
    a021 = 3 / 4
    a031 = 0.0
    a032 = 0.0
    a041 = 0.0
    a042 = 0.0
    a043 = 0.0
    # diffusion-argument drift coefficients (A1)
    a121 = 1 / 4
    a131 = 1.0
    a132 = 0.0
    a141 = 0.0
    a142 = 0.0
    a143 = 1 / 4
    # B0 (χ₂ weights inside H0 stages)
    b021 = 3 / 2
    b031 = 0.0
    b032 = 0.0
    b041 = 0.0
    b042 = 0.0
    b043 = 0.0
    # B1 (√dt weights inside H1 stages)
    b121 = 1 / 2
    b131 = -1.0
    b132 = 0.0
    b141 = -5.0
    b142 = 3.0
    b143 = 1 / 2
    # stage times
    c02 = 3 / 4
    c03 = 0.0
    c04 = 0.0
    c11 = 0.0
    c12 = 1 / 4
    c13 = 1.0
    c14 = 1 / 4
    # solution weights
    alpha1 = 1 / 3
    alpha2 = 2 / 3
    alpha3 = 0.0
    alpha4 = 0.0
    beta11, beta12, beta13, beta14 = -1.0, 4 / 3, 2 / 3, 0.0
    beta21, beta22, beta23, beta24 = -1.0, 4 / 3, -1 / 3, 0.0
    beta31, beta32, beta33, beta34 = 2.0, -4 / 3, -2 / 3, 0.0
    beta41, beta42, beta43, beta44 = -2.0, 5 / 3, -2 / 3, 1.0


# the reference names its default SDE solver SOSRI (src/layers/neural_sde.jl:12);
# this framework routes that name to the SRIW1 tableau (see module docstring).
SOSRITableau = SRIW1Tableau
