"""Pipeline base: static configuration + pure param-pytree transforms.

The reference models a Pipeline as a stateful object owning torch modules
(``pipelines/pipeline.py:10-92``). The TPU-native redesign separates the two
JAX-idiomatic halves:

- the Pipeline object holds only *static* configuration (config dict, scene
  transform, encoder specs) — safe to close over inside ``jit``;
- learnable state is an explicit params pytree created by ``init_params`` and
  threaded through the pure ``forward`` / ``compute_loss`` / ``extract``
  functions, so one jitted train step covers forward+loss+backward+update and
  shards transparently under a device mesh.

Train/eval mode is a per-call property: passing ``key=None`` to ``forward``
selects the deterministic path (midpoint sampling, no density noise).
"""

from __future__ import annotations

import warnings
from typing import Any, Mapping

import jax
import optax


class Pipeline:
    """Base class; subclasses implement the stubs below."""

    def __init__(self, config: dict, dataset) -> None:
        """Common validation and scene capture (reference pipeline.py:18-60)."""
        self.ray_origin_height = dataset.config["ray_origin_height"]
        assert not (
            config["point_preprocessor"] == "horizontal"
            and config["include_height"]
        )
        if (
            not config["point_preprocessor"]
            and isinstance(config.get("encoder", {}).get("L_x"), list)
            and not all(
                n == config["encoder"]["L_x"][0] for n in config["encoder"]["L_x"]
            )
        ):
            warnings.warn(
                "Are you sure you want to use a variable encoding dimension "
                "for non-transformed coordinates?"
            )
        self.config = config
        self.scale = dataset.scale
        self.offset = dataset.offset
        if config["point_preprocessor"]:
            self.point_preprocessor = dataset.get_point_preprocessor(
                config["point_preprocessor"]
            )
        else:
            self.point_preprocessor = None

    # -- pure transforms -----------------------------------------------------

    def init_params(self, key: jax.Array) -> dict:
        raise NotImplementedError

    def init_aux(self) -> dict:
        """Non-learnable train-state buffers (e.g. the occupancy grid).
        Empty for pipelines without aux state."""
        return {}

    def update_aux(self, params: dict, aux: dict, key: jax.Array) -> dict:
        """Periodic aux refresh (host-side cadence); identity by default."""
        return aux

    def forward(
        self,
        params: dict,
        ray_batch: Mapping[str, jax.Array],
        key: jax.Array | None = None,
        aux: dict | None = None,
    ) -> dict[str, jax.Array]:
        raise NotImplementedError

    def compute_loss(
        self,
        ray_batch: Mapping[str, jax.Array],
        results: Mapping[str, jax.Array],
    ) -> jax.Array:
        raise NotImplementedError

    def extract(self, params: dict, pts: jax.Array) -> jax.Array:
        raise NotImplementedError

    def make_optimizer(self, optimizer_config: dict, lr_schedule) -> Any:
        raise NotImplementedError

    # -- conveniences --------------------------------------------------------

    def loss_and_results(
        self,
        params: dict,
        ray_batch: Mapping[str, jax.Array],
        key: jax.Array | None,
        aux: dict | None = None,
    ):
        results = self.forward(params, ray_batch, key, aux=aux)
        return self.compute_loss(ray_batch, results), results
