"""Hierarchical (coarse + fine) NeRF pipeline.

Functional parity with reference ``pipelines/nerf.py:16-273``: stratified
64-bin coarse pass, inverse-CDF 128-sample fine pass merged with the coarse
z-vals, frequency encoding (per-axis L list supported), two AtmoNeRF MLPs
(coarse: 1 density channel, fine: per-band), exp color activation clamped at
11, ReLU density, Beer-Lambert compositing with z in km, and summed coarse +
fine MSE losses on the per-ray band radiance.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import optax

from atmonr_tpu.models.encoders import positional_encoding
from atmonr_tpu.models.mlp import atmonerf_apply, get_nerf_models
from atmonr_tpu.ops.compositor import render
from atmonr_tpu.ops.samplers import append_heights, sample_pdf, sample_uniform_bins
from atmonr_tpu.pipelines.base import Pipeline


class NeRFPipeline(Pipeline):
    """NeRF (https://arxiv.org/abs/2003.08934) adapted to atmospheric scenes."""

    def init_params(self, key: jax.Array) -> dict:
        coarse, fine = get_nerf_models(
            key,
            hidden_dim=self.config["mlp_hidden_dim"],
            N_lambda=self.config["num_bands"],
            L_x=self.config["encoder"]["L_x"],
            L_d=self.config["encoder"]["L_d"],
            include_height=self.config["include_height"],
        )
        return {"coarse": coarse, "fine": fine}

    def _forward(
        self,
        params: dict,
        mode: str,
        ray_batch: Mapping[str, jax.Array],
        key: jax.Array | None,
        weights_coarse: jax.Array | None = None,
        z_vals_coarse: jax.Array | None = None,
    ) -> dict[str, jax.Array]:
        """One stage of the hierarchical forward (reference nerf.py:73-167).

        ``key=None`` selects the deterministic path: bin midpoints / quantile
        midpoints and no density noise (eval + parity mode).
        """
        assert (mode == "coarse") == (z_vals_coarse is None)
        b = ray_batch["origin"].shape[0]
        L_x = self.config["encoder"]["L_x"]
        L_d = self.config["encoder"]["L_d"]

        if key is None:
            k_sample = k_noise = None
        else:
            k_sample, k_noise = jax.random.split(key)

        if mode == "coarse":
            n = self.config["sampler"]["N_c"]
            pts, z_vals = sample_uniform_bins(ray_batch, n_bins=n, key=k_sample)
        else:
            n = self.config["sampler"]["N_c"] + self.config["sampler"]["N_f"]
            pts, z_vals = sample_pdf(
                ray_batch,
                weights_coarse,
                z_vals_coarse,
                n_samples=self.config["sampler"]["N_f"],
                key=k_sample,
            )

        if self.point_preprocessor:
            pts = self.point_preprocessor(pts)
        if self.config["include_height"]:
            pts = append_heights(
                pts, self.ray_origin_height, self.scale, self.offset
            )

        pts_enc = jnp.reshape(positional_encoding(pts, L_x), (b * n, -1))
        dirs = jnp.broadcast_to(
            ray_batch["dir"][:, None], (b, n, 3)
        )
        dirs_enc = jnp.reshape(positional_encoding(dirs, L_d), (b * n, -1))
        x = jnp.concatenate([pts_enc, dirs_enc], axis=1)

        color, sigma = atmonerf_apply(params[mode], x, noise_key=k_noise)
        color = jnp.reshape(color, (b, n, -1))
        sigma = jnp.reshape(sigma, (b, n, 1) if mode == "coarse" else (b, n, -1))

        # exp color activation, clamped at 11 for fp16 overflow safety
        color = jnp.exp(jnp.clip(color, max=11.0))
        sigma = jax.nn.relu(sigma)

        color_map, _, weights = render(
            z_vals * (self.scale / 1000.0), color, sigma
        )
        results = {
            f"color_{mode}": color,
            f"sigma_{mode}": sigma,
            f"color_map_{mode}": color_map,
            f"weights_{mode}": weights,
            f"z_vals_{mode}": z_vals,
        }
        if self.config["include_height"]:
            results[f"norm_heights_{mode}"] = pts[..., 3]
        return results

    def forward(
        self,
        params: dict,
        ray_batch: Mapping[str, jax.Array],
        key: jax.Array | None = None,
        aux: dict | None = None,  # no aux state; accepted for API parity
    ) -> dict[str, jax.Array]:
        kc = kf = None
        if key is not None:
            kc, kf = jax.random.split(key)
        results = self._forward(params, "coarse", ray_batch, kc)
        results.update(
            self._forward(
                params,
                "fine",
                ray_batch,
                kf,
                weights_coarse=results["weights_coarse"],
                z_vals_coarse=results["z_vals_coarse"],
            )
        )
        return results

    def compute_loss(self, ray_batch, results) -> jax.Array:
        """Coarse + fine MSE on the ray's own band (reference nerf.py:219-240)."""
        irgb = ray_batch["irgb_idx"][:, None]
        res_c = jnp.take_along_axis(results["color_map_coarse"], irgb, axis=1)[:, 0]
        res_f = jnp.take_along_axis(results["color_map_fine"], irgb, axis=1)[:, 0]
        loss_c = jnp.mean((res_c - ray_batch["rad"]) ** 2)
        loss_f = jnp.mean((res_f - ray_batch["rad"]) ** 2)
        return loss_c + loss_f

    def extract(self, params: dict, pts: jax.Array) -> jax.Array:
        """Extinction at normalized-scene points (reference nerf.py:190-217)."""
        from atmonr_tpu.models.mlp import atmonerf_forward_pos_only

        if self.point_preprocessor:
            pts = self.point_preprocessor(pts[None])[0]
        if self.config["include_height"]:
            pts = append_heights(
                pts[None], self.ray_origin_height, self.scale, self.offset
            )[0]
        pts_enc = jnp.reshape(
            positional_encoding(pts, self.config["encoder"]["L_x"]),
            (pts.shape[0], -1),
        ).astype(jnp.float32)
        _, sigma = atmonerf_forward_pos_only(params["fine"], pts_enc)
        return jnp.clip(sigma, min=0)

    def make_optimizer(self, optimizer_config: dict, lr_schedule):
        """Adam over both MLPs (reference nerf.py:56-71)."""
        from atmonr_tpu.training.schedules import apply_warmup

        return optax.adam(
            learning_rate=apply_warmup(lr_schedule, optimizer_config)
        )
