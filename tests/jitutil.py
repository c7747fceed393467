"""Jitted wrappers for pipeline calls in tests.

Eager per-op dispatch of the 16-level hash encode / NeRF forward costs tens
of seconds per call on this 2-CPU box; under jit the same call traces in
~1 s and the XLA compile is served from the persistent cache
(tests/conftest.py) on unchanged code. Use these for every full-pipeline
forward/grad in tests.
"""

import jax


def jit_forward(pipe, params, batch, key=None, aux=None):
    return jax.jit(lambda p, b: pipe.forward(p, b, key=key, aux=aux))(
        params, batch
    )


def jit_grad(loss_fn, params):
    return jax.jit(jax.grad(loss_fn))(params)
