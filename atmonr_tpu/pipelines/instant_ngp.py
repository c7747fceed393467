"""Instant-NGP pipeline (no occupancy grid) with a separate surface branch.

Functional parity with reference ``pipelines/instant_ngp.py:23-297``,
replacing tiny-cuda-nn's CUDA modules with TPU-native equivalents:

- ``HashGrid`` encodings -> ``atmonr_tpu.models.hash_grid`` (pure-XLA gather
  path; the fused Pallas hash-encode+MLP path in ``atmonr_tpu.ops`` is used
  on TPU for the hot pos branch);
- ``FullyFusedMLP`` -> ``atmonr_tpu.models.mlp.small_mlp_*`` (bias-free
  narrow ReLU MLPs, bf16 matmuls on the MXU);
- ``SphericalHarmonics``/``Composite``/``Identity`` -> config-driven
  composite encoder (``atmonr_tpu.models.encoders``).

Structure per the reference: 1024 uniform samples/ray; 3-D hash encoding of
[0,1]-remapped, altitude-compressed points -> density MLP (16 outputs, first
1-or-num_bands are densities); SH(dirs) + identity(features) -> color MLP;
surface branch: 2-D hash of the remapped surface point + SH(dirs) -> surface
color MLP; ReLU activations; ``render_with_surface`` compositing; selectable
loss; AdamW with weight decay on MLPs only.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import optax

from atmonr_tpu.models import hash_grid as hg
from atmonr_tpu.models.encoders import (
    apply_composite,
    composite_output_dim,
    init_composite,
    parse_encoding_config,
)
from atmonr_tpu.models.mlp import small_mlp_apply, small_mlp_init
from atmonr_tpu.ops import occupancy
from atmonr_tpu.ops.compositor import render, render_with_surface
from atmonr_tpu.ops.samplers import (
    append_heights,
    sample_pdf,
    sample_piecewise,
    sample_uniform_bins,
)
from atmonr_tpu.ops.losses import get_loss
from atmonr_tpu.pipelines.base import Pipeline

_POS_MLP_OUT = 16  # intermediate width of the density MLP (reference :66)


class InstantNGPPipeline(Pipeline):
    """Instant-NGP (Mueller et al. 2022) adapted to atmospheric satellite data."""

    def __init__(self, config: dict, dataset) -> None:
        super().__init__(config, dataset)
        self.num_density_outputs = (
            config["num_bands"] if config["multi_band_extinction"] else 1
        )
        self.num_inputs = 4 if config["include_height"] else 3
        ngp = config["instant_ngp"]

        self.pos_cfg = hg.HashGridConfig.from_options(
            ngp["encoding"], self.num_inputs
        )
        # stochastic rounding of the q8 forward quantization (training only;
        # eval/extract run key=None and round deterministically)
        self.pos_sr = bool(ngp["encoding"].get("stochastic_rounding", False))
        # density activation: "relu" is the reference's model (instant_ngp.py
        # :183-184 "ReLU activation for density") and the golden-parity
        # default. "softplus" is the config-gated collapse guard: r5 found a
        # seed-borne failure (seed 4, every variant, WITH clip_global_norm)
        # where the first steps' global brightness correction drives the
        # whole density field negative, the ReLU then zeroes all density
        # gradient, and momentum entrenches it (loss pins ~1.7, constant
        # image — docs/performance.md "the seed-4 collapse"). Softplus keeps
        # the gradient alive below zero so the field can recover; applied
        # identically at the forward, NeRF-coarse, occupancy-update and
        # extinction sites.
        act = str(config.get("density_activation", "relu"))
        if act not in ("relu", "softplus"):
            raise ValueError(f"unknown density_activation {act!r}")
        self.density_act = jax.nn.relu if act == "relu" else jax.nn.softplus
        # surface head init: "default" is the reference's Xavier head.
        # "quiet" scales the surface MLP's output layer by 0.01 at init so
        # the ATMOSPHERE branch wins the early mean-fitting race: the r5
        # seed-4 collapse isolated to the params init alone (either seed's
        # key/perm stream reproduces/avoids it) — when the surface head
        # captures the scene mean first, the compositor's density gradient
        # hits the ReLU's dead side and the atmosphere branch dies with
        # EXACTLY zero gradient (pos_table/pos_mlp/dir_mlp all 0.0), after
        # which a surface-only model cannot fit cloud parallax and the
        # loss floors ~1.7. A quiet (not zero: relu'(0)=0 would kill the
        # surface head permanently) start removes the competitor without
        # changing the converged model class.
        shi = str(config.get("surface_head_init", "default"))
        if shi not in ("default", "quiet"):
            raise ValueError(f"unknown surface_head_init {shi!r}")
        self.surface_head_init = shi
        self.dir_specs = parse_encoding_config(ngp["dir_encoding"])
        self.dir_in_dims = 3 + _POS_MLP_OUT - self.num_density_outputs
        self.dir_enc_dims = composite_output_dim(self.dir_specs, self.dir_in_dims)
        self.surf_specs = parse_encoding_config(ngp["surface_encoding"])
        self.surf_in_dims = 2 + 3
        self.surf_enc_dims = composite_output_dim(
            self.surf_specs, self.surf_in_dims
        )

        self.max_i = dataset.max_i
        self.loss_fn = get_loss(config["loss"])
        # bf16 matmuls on the MXU mirror tcnn's fp16 tensor-core compute;
        # parity tests force f32 via this flag.
        self.compute_dtype = jnp.bfloat16

        self.occ_cfg = None
        if config.get("occupancy"):
            # the dense grid re-eval generates points directly in the
            # preprocessed unit cube; an appended-height channel would need
            # the inverse preprocessor, which "horizontal" doesn't define
            assert not config["include_height"], (
                "occupancy grid requires include_height=false"
            )
            self.occ_cfg = occupancy.OccupancyConfig.from_options(
                config["occupancy"]
            )

    def init_params(self, key: jax.Array) -> dict:
        ngp = self.config["instant_ngp"]
        keys = jax.random.split(key, 6)
        params = {
            "pos_table": hg.init_hash_table(keys[0], self.pos_cfg),
            "pos_mlp": small_mlp_init(
                keys[1],
                in_dim=self.pos_cfg.n_output_dims,
                out_dim=_POS_MLP_OUT,
                n_neurons=int(ngp["network"]["n_neurons"]),
                n_hidden_layers=int(ngp["network"]["n_hidden_layers"]),
            ),
            "dir_mlp": small_mlp_init(
                keys[2],
                in_dim=self.dir_enc_dims,
                out_dim=self.config["num_bands"],
                n_neurons=int(ngp["rgb_network"]["n_neurons"]),
                n_hidden_layers=int(ngp["rgb_network"]["n_hidden_layers"]),
            ),
            "surf_enc": init_composite(keys[3], self.surf_specs, self.surf_in_dims),
            "surf_mlp": small_mlp_init(
                keys[4],
                in_dim=self.surf_enc_dims,
                out_dim=self.config["num_bands"],
                n_neurons=int(ngp["surface_network"]["n_neurons"]),
                n_hidden_layers=int(ngp["surface_network"]["n_hidden_layers"]),
            ),
        }
        if self.surface_head_init == "quiet":
            last = params["surf_mlp"]["layers"][-1]
            last["w"] = last["w"] * 0.01
        return params

    def _pos_branch(
        self,
        params: dict,
        pts_flat: jax.Array,
        sr_noise: jax.Array | None = None,
    ) -> jax.Array:
        """Hash-encode + density MLP over flattened points -> (M, 16)."""
        pos_enc = hg.hash_encode(
            params["pos_table"], pts_flat, self.pos_cfg, False, sr_noise
        )
        return small_mlp_apply(
            params["pos_mlp"], pos_enc, compute_dtype=self.compute_dtype
        )

    # -- occupancy-grid aux state ---------------------------------------------

    def init_aux(self) -> dict:
        if self.occ_cfg is None:
            return {}
        return {"occ": occupancy.init_grid(self.occ_cfg)}

    def update_aux(self, params: dict, aux: dict, key: jax.Array) -> dict:
        """Full density re-evaluation at jittered cell centers -> EMA-max
        grid update. Call every ``occupancy.update_every`` steps (host-side
        cadence); one extra forward over num_cells points."""
        if self.occ_cfg is None:
            return aux
        u = occupancy.cell_points(self.occ_cfg, key)
        hash_in = jnp.concatenate(
            [u[:, :2], u[:, 2:] / self.config["alt_compress_factor"]], axis=-1
        )
        pos_out = self._pos_branch(params, hash_in)
        sigma = self.density_act(
            jnp.max(pos_out[:, : self.num_density_outputs], axis=-1)
        )
        return {"occ": occupancy.update_grid(aux["occ"], sigma, self.occ_cfg)}

    def _unit_coords(self, pts: jax.Array) -> jax.Array:
        """Normalized scene points -> the preprocessed [0,1]^3 cube (the
        occupancy grid's space: post-preprocessor, pre altitude compression)."""
        if self.point_preprocessor:
            pts = self.point_preprocessor(pts)
        return (pts + 1.0) / 2.0

    def _encoder_inputs(self, pts: jax.Array) -> jax.Array:
        """Normalized scene points (B, N, 3) -> hash-encoder inputs: point
        preprocessor, [0,1] remap (Instant-NGP convention, reference
        instant_ngp.py:149-150), optional height channel, altitude
        compression (reference :160)."""
        pts = self._unit_coords(pts)
        if self.config["include_height"]:
            pts = append_heights(
                pts, self.ray_origin_height, self.scale, self.offset
            )
        # compress the altitude so the hash encoding behaves better
        alt_c = pts[..., 2] / self.config["alt_compress_factor"]
        return jnp.concatenate(
            [pts[..., :2], alt_c[..., None], pts[..., 3:]], axis=-1
        )

    def _sample(
        self,
        params: dict,
        ray_batch: Mapping[str, jax.Array],
        key: jax.Array | None,
        aux: dict | None = None,
    ) -> tuple[jax.Array, jax.Array, int]:
        """Sample positions along rays -> (pts, z_vals, n).

        Default: the reference's brute-force uniform stratified sampling
        (``num_samples_per_ray``, reference instant_ngp.py:139). With the
        ``importance_sampler`` config key — a capability the reference lacks
        ("no occupancy grid", its :27 docstring) — a cheap inference-only
        coarse density pass drives inverse-CDF importance sampling
        (``sample_pdf``, the hierarchical-NeRF machinery), concentrating the
        n_coarse + n_fine full evaluations where the medium actually is:
        matching radiometry at ~2-8x fewer point evals than uniform. The
        coarse weights are gradient-stopped, so no backward runs through the
        coarse pass; the network still trains at the coarse z's because the
        merged fine pass re-evaluates them.
        """
        if self.occ_cfg is not None and aux:
            oc = self.occ_cfg
            if key is not None:
                kp, kf = jax.random.split(key)
            else:
                kp = kf = None
            pts_p, _ = sample_uniform_bins(ray_batch, oc.n_probe, key=kp)
            u = self._unit_coords(pts_p)
            w = occupancy.probe_weights(
                jax.lax.stop_gradient(aux["occ"]), u, oc
            )
            pts, z_vals = sample_piecewise(ray_batch, w, oc.n_fine, key=kf)
            return pts, z_vals, oc.n_fine
        imp = self.config.get("importance_sampler")
        if not imp:
            n = self.config["num_samples_per_ray"]
            pts, z_vals = sample_uniform_bins(ray_batch, n, key=key)
            return pts, z_vals, n
        n_c, n_f = int(imp["n_coarse"]), int(imp["n_fine"])
        if key is not None:
            kc, kf = jax.random.split(key)
        else:
            kc = kf = None
        b = ray_batch["origin"].shape[0]
        pts_c, z_c = sample_uniform_bins(ray_batch, n_c, key=kc)
        enc_in = self._encoder_inputs(pts_c)
        pos_out = self._pos_branch(params, jnp.reshape(enc_in, (b * n_c, -1)))
        sigma_c = self.density_act(pos_out[:, :1]).reshape(b, n_c, 1)
        _, _, w_c = render(
            z_c * (self.scale / 1000.0),
            jnp.ones((b, n_c, 1), sigma_c.dtype),
            sigma_c,
        )
        w_c = jax.lax.stop_gradient(w_c.astype(jnp.float32))
        pts, z_vals = sample_pdf(ray_batch, w_c, z_c, n_f, key=kf)
        return pts, z_vals, n_c + n_f

    def forward(
        self,
        params: dict,
        ray_batch: Mapping[str, jax.Array],
        key: jax.Array | None = None,
        aux: dict | None = None,
    ) -> dict[str, jax.Array]:
        """One Instant-NGP forward (reference instant_ngp.py:129-206).

        ``aux`` carries the occupancy grid when configured; without it the
        sampler falls back to importance/uniform sampling (eval paths)."""
        b = ray_batch["origin"].shape[0]
        sr_noise = None
        if self.pos_sr and key is not None:
            key, k_sr = jax.random.split(key)
            sr_noise = jax.random.uniform(
                k_sr, params["pos_table"].shape, dtype=jnp.float32
            )
        pts, z_vals, n = self._sample(params, ray_batch, key, aux)
        pts_surf = (
            ray_batch["origin"] + ray_batch["dir"] * ray_batch["len"][:, None]
        )
        pts_surf = (pts_surf + 1.0) / 2.0

        dirs = jnp.broadcast_to(ray_batch["dir"][:, None], (b, n, 3))
        pts = self._encoder_inputs(pts)

        pos_out = self._pos_branch(
            params, jnp.reshape(pts, (b * n, -1)), sr_noise
        )
        nd = self.num_density_outputs
        dir_in = jnp.concatenate(
            [jnp.reshape(dirs, (b * n, 3)), pos_out[:, nd:]], axis=1
        )
        dir_enc = apply_composite([{}] * len(self.dir_specs), self.dir_specs, dir_in)
        color = small_mlp_apply(
            params["dir_mlp"], dir_enc, compute_dtype=self.compute_dtype
        )
        color = jnp.reshape(color, (b, n, self.config["num_bands"]))

        surf_in = jnp.concatenate([pts_surf[:, :2], dirs[:, 0]], axis=1)
        surf_enc = apply_composite(params["surf_enc"], self.surf_specs, surf_in)
        color_surf = small_mlp_apply(
            params["surf_mlp"], surf_enc, compute_dtype=self.compute_dtype
        )

        sigma = jnp.reshape(pos_out[..., :nd], (b, n, -1))

        color = jax.nn.relu(color)
        color_surf = jax.nn.relu(color_surf)
        sigma = self.density_act(sigma)

        color_map, _, weights, color_map_atmo, color_map_surf = (
            render_with_surface(
                z_vals * (self.scale / 1000.0), color, sigma, color_surf
            )
        )
        return {
            "color_fine": color[:, :-1],
            "color_surf": color_surf,
            "color_map_surf": color_map_surf,
            "color_map_atmo": color_map_atmo,
            "sigma_fine": sigma[:, :-1],
            "color_map_fine": color_map,
            "weights_fine": weights,
            "z_vals_fine": z_vals,
        }

    def compute_loss(self, ray_batch, results) -> jax.Array:
        """Selected loss on the ray's own band (reference instant_ngp.py:249-263)."""
        pred = jnp.take_along_axis(
            results["color_map_fine"], ray_batch["irgb_idx"][:, None], axis=1
        )[:, 0]
        gt = ray_batch["rad"].astype(pred.dtype)
        return self.loss_fn(pred, gt, self.max_i)

    def extract(self, params: dict, pts: jax.Array) -> jax.Array:
        """Extinction at normalized-scene points (reference instant_ngp.py:208-247)."""
        pts = self._encoder_inputs(pts[None])[0]
        pos_out = self._pos_branch(params, pts)
        nd = self.num_density_outputs
        return self.density_act(
            pos_out[..., :nd].reshape(pts.shape[0], nd)
        )

    def make_optimizer(self, optimizer_config: dict, lr_schedule):
        """AdamW; weight decay on MLPs only, not the hash tables
        (reference instant_ngp.py:107-127)."""
        from atmonr_tpu.training.schedules import apply_warmup

        lr_schedule = apply_warmup(lr_schedule, optimizer_config)
        b1, b2 = optimizer_config.get("betas", (0.9, 0.999))

        def decay_mask(params):
            def full(tree, val):
                return jax.tree_util.tree_map(lambda _: val, tree)

            return {
                "pos_table": False,
                "pos_mlp": full(params["pos_mlp"], True),
                "dir_mlp": full(params["dir_mlp"], True),
                "surf_enc": full(params["surf_enc"], False),
                "surf_mlp": full(params["surf_mlp"], True),
            }

        opt = optax.adamw(
            learning_rate=lr_schedule,
            b1=b1,
            b2=b2,
            eps=optimizer_config.get("eps", 1e-8),
            weight_decay=optimizer_config.get("weight_decay", 0.0),
            mask=decay_mask,
        )
        clip = optimizer_config.get("clip_global_norm")
        if clip:
            # divergence guard: the tcnn-style eps=1e-15 makes early AdamW
            # updates near-sign-magnitude (~lr per param) while 2nd moments
            # are tiny, which can drive the density MLP into a dead-ReLU
            # collapse on unlucky seeds (reproduced + isolated in
            # tools/repro_occ15_collapse.py: loss pins at ~1.7 with
            # grad-norm ~1e-3 from iter ~50; clip 1.0 fully recovers it,
            # PSNR 35.1 -> 48.8)
            opt = optax.chain(optax.clip_by_global_norm(float(clip)), opt)
        return opt
