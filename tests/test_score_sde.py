"""Score-SDE sampler tests: adaptive reverse-time VP-SDE and
probability-flow ODE samplers recover an analytic Gaussian target."""
import jax
import numpy as np

from localregneuralde_tpu.models.score_sde import (
    gaussian_score_fn,
    sample_probability_flow,
    sample_vpsde,
)


def test_vpsde_sampler_recovers_gaussian():
    score = gaussian_score_fn(mean=2.0, var=0.25)

    @jax.jit
    def draw(key):
        s, sol = sample_vpsde(
            score, (256,), key, rtol=5e-2, atol=5e-2, max_steps=512
        )
        return s, sol.success

    samples = []
    for i in range(6):
        s, ok = draw(jax.random.PRNGKey(i))
        assert bool(ok)
        samples.append(np.asarray(s))
    s = np.concatenate(samples)
    assert abs(s.mean() - 2.0) < 0.1
    assert abs(s.std() - 0.5) < 0.1


def test_probability_flow_sampler():
    score = gaussian_score_fn(mean=-1.0, var=1.0)
    s, sol = sample_probability_flow(
        score, (512,), jax.random.PRNGKey(0), rtol=1e-4, atol=1e-6,
        max_steps=512,
    )
    assert bool(sol.success)
    s = np.asarray(s)
    assert abs(s.mean() + 1.0) < 0.15
    assert abs(s.std() - 1.0) < 0.15
    assert int(sol.nfe) > 0  # NFE is the sampler's headline observable
