"""Neural textures: 2D hash-grid + small MLP, SH texture pyramids.

Re-designs the reference's tiny-cuda-nn textures
(reference volsurfs_py/models/neural_texture.py:17-262,
models/sh_neural_textures.py:9-125) in JAX:

- 2D multires hash encoding (16 levels, 2 feats, 2^15, base 16, growth 1.5)
  + 64x2 ReLU MLP,
- three sampling modes: ``bake`` (raw uv, assumed texel centers), ``anchor``
  (snap to texel center) and ``lerp`` (manual 4-corner bilinear of OUTPUTS in
  float16, matching the WebGL viewer's filtering),
- optional sigmoid squeeze + straight-through 0-255 quantization
  (reference utils/math.py round_ste) and un-squeeze to a value range,
- SHNeuralTextures: one texture per SH band with per-band resolution
  [2048,1024,512,256], band coefficient counts [1,3,5,7] and value ranges
  +-sh_range[band].

UV convention: u along width, v along height with v=0 at the texture bottom
(flip=True in the reference helpers).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from volsurfs_tpu.ops.sh import sh_eval

_PRIMES_2D = (1, 2654435761)


def round_ste(x):
    """Round with straight-through gradient (reference utils/math.py:5-19)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


class HashGrid2D(nn.Module):
    """2D multiresolution hash encoding (tcnn HashGrid parity: 16 levels,
    2 features, 2^15 entries, base res 16, growth 1.5)."""

    nr_levels: int = 16
    nr_feat_per_level: int = 2
    log2_hashmap_size: int = 15
    base_resolution: float = 16.0
    growth_factor: float = 1.5

    @property
    def output_dim(self):
        return self.nr_levels * self.nr_feat_per_level

    def _level_sizes(self):
        """Per-level (rows, direct_side): collision-free direct indexing when
        the level's full corner grid fits the capacity, hashed otherwise —
        same per-level sizing as the 3D encoders (encodings._level_layout)."""
        T = 2**self.log2_hashmap_size
        sizes, direct = [], []
        for r in self.base_resolution * self.growth_factor ** np.arange(
            self.nr_levels
        ):
            side = int(np.floor(r)) + 2
            if side**2 <= T:
                sizes.append(side**2)
                direct.append(side)
            else:
                sizes.append(T)
                direct.append(0)
        return sizes, direct

    @nn.compact
    def __call__(self, uv):
        L, F = self.nr_levels, self.nr_feat_per_level
        # fused 4-corner lookup through the shared custom-VJP path: one
        # gather forward; backward is a dense one-hot matmul for coarse
        # levels + one scalar-flat scatter for fine levels (see
        # encodings._hash_lookup / _table_grad_accumulate)
        from volsurfs_tpu.models.encodings import _hash_lookup, _level_layout

        sizes, direct = self._level_sizes()
        offsets, total_rows, nr_dense, dense_rows = _level_layout(sizes)
        layout = (nr_dense, dense_rows, tuple(int(s) for s in sizes))
        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1e-4, maxval=1e-4),
            (total_rows, F),
        )
        res = jnp.asarray(
            self.base_resolution * self.growth_factor ** np.arange(L), jnp.float32
        )
        batch_shape = uv.shape[:-1]
        p = uv.reshape(-1, 2)
        scaled = p[:, None, :] * res[None, :, None]
        floor = jnp.floor(scaled)
        frac = scaled - floor
        floor = floor.astype(jnp.int32)

        level_off = jnp.asarray(offsets, jnp.int32)[None, :]
        sizes_arr = jnp.asarray(sizes, jnp.uint32)[None, :]
        direct_side = jnp.asarray(direct, jnp.int32)[None, :]  # 0 = hashed
        corner_idx, corner_w = [], []
        for corner in range(4):
            off = jnp.asarray([corner & 1, (corner >> 1) & 1], jnp.int32)
            c = floor + off[None, None, :]
            cu = c.astype(jnp.uint32)
            h = cu[..., 0] * jnp.uint32(_PRIMES_2D[0]) ^ cu[..., 1] * jnp.uint32(
                _PRIMES_2D[1]
            )
            hashed = (h % sizes_arr).astype(jnp.int32)
            cd = jnp.clip(c, 0, jnp.maximum(direct_side, 1)[..., None] - 1)
            lin = cd[..., 0] + direct_side * cd[..., 1]
            corner_idx.append(
                jnp.where(direct_side > 0, lin, hashed) + level_off
            )
            corner_w.append(jnp.prod(
                jnp.where(off[None, None, :] == 1, frac, 1.0 - frac), axis=-1
            ))
        flat_idx = jnp.stack(corner_idx, axis=-1)  # [N, L, 4]
        weights = jnp.stack(corner_w, axis=-1)
        feats = _hash_lookup(layout, table, flat_idx, weights)
        return feats.reshape(*batch_shape, L * F)


class NeuralTexture(nn.Module):
    """Hash-encoded texture with anchor/lerp/bake sampling."""

    res: Tuple[int, int] = (1024, 1024)  # (height, width)
    nr_channels: int = 3
    val_range: Tuple[float, float] = (0.0, 1.0)
    anchor: bool = False
    lerp: bool = False
    quantize_output: bool = False
    squeeze_output: bool = False
    align_to_webgl: bool = False  # 90-deg UV rotation (WebGL-viewer export
    # convention, reference neural_texture.py:96-121; our own trainer/baker/
    # renderer share one convention so this stays off internally)
    mlp_dtype: str | None = None  # bf16 compute under hp.use_grad_scaler

    def setup(self):
        from volsurfs_tpu.models.mlp import MLP

        self.encoding = HashGrid2D()
        self.network = MLP(
            (64, 64, self.nr_channels), last_layer_linear=True,
            activation="relu", dtype=self.mlp_dtype,
        )

    def _texel_center_uv(self, pix):
        """integer texel coords (x, y) -> normalized uv of the texel center."""
        H, W = self.res
        u = (pix[..., 0] + 0.5) / W
        v = 1.0 - (pix[..., 1] + 0.5) / H
        return jnp.stack([u, v], -1)

    def _query(self, uv):
        return self.network(self.encoding(uv))

    def __call__(self, uv_coords, bake: bool = False):
        H, W = self.res
        if bake:
            raw = self._query(uv_coords)
            out = raw
            if self.squeeze_output:
                out = jax.nn.sigmoid(out)
                if self.quantize_output:
                    out = round_ste(out * 255.0) / 255.0
            return out

        # continuous pixel coords with v-flip
        x = uv_coords[..., 0] * W - 0.5
        y = (1.0 - uv_coords[..., 1]) * H - 0.5

        if self.align_to_webgl:
            # rotate 90 deg: (i, j) -> (width - j, i) (reference
            # neural_texture.py:96-121; anchor uses width-1-j on the
            # rounded pixel, lerp width-j on the continuous coord)
            if self.anchor:
                x, y = (W - 1) - y, x
            else:
                x, y = W - y, x

        if self.anchor:
            pix = jnp.stack(
                [jnp.clip(jnp.round(x), 0, W - 1), jnp.clip(jnp.round(y), 0, H - 1)],
                -1,
            )
            out = self._query(self._texel_center_uv(pix))
            out = self._postprocess_single(out)
            return out.astype(jnp.float32)

        if self.lerp:
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = (x - x0)[..., None]
            fy = (y - y0)[..., None]
            outs = []
            weights = []
            for cx, cy, wgt in (
                (0, 0, (1 - fx) * (1 - fy)),
                (1, 0, fx * (1 - fy)),
                (0, 1, (1 - fx) * fy),
                (1, 1, fx * fy),
            ):
                pix = jnp.stack(
                    [jnp.clip(x0 + cx, 0, W - 1), jnp.clip(y0 + cy, 0, H - 1)], -1
                )
                corner_out = self._query(self._texel_center_uv(pix))
                outs.append(self._postprocess_single(corner_out))
                weights.append(wgt)
            # bilinear blend of OUTPUTS in float16 (WebGL filtering parity,
            # reference neural_texture.py:104-140,186)
            out = sum(
                o.astype(jnp.float16) * w.astype(jnp.float16)
                for o, w in zip(outs, weights)
            )
            return out.astype(jnp.float32)

        raise ValueError("NeuralTexture requires anchor=True, lerp=True or bake=True")

    def _postprocess_single(self, out):
        """squeeze -> quantize -> float16 -> expand to val_range
        (reference neural_texture.py:147-186)."""
        if self.squeeze_output:
            out = jax.nn.sigmoid(out)
            if self.quantize_output:
                out = round_ste(out * 255.0) / 255.0
        out = out.astype(jnp.float16)
        if self.squeeze_output:
            lo, hi = self.val_range
            out = lo + (hi - lo) * out
        return out


DEG_NR_COEFFS = (1, 3, 5, 7)


class SHNeuralTextures(nn.Module):
    """Per-SH-band texture pyramid
    (reference models/sh_neural_textures.py:9-125)."""

    sh_deg: int = 3
    nr_channels: int = 3
    sh_range: Sequence[float] = (1.0, 5.0, 10.0, 20.0)
    deg_res: Sequence[int] = (2048, 1024, 512, 256)
    anchor: bool = False
    lerp: bool = True
    quantize_output: bool = False
    squeeze_output: bool = False
    align_to_webgl: bool = False
    mlp_dtype: str | None = None  # bf16 compute under hp.use_grad_scaler

    @property
    def nr_coeffs(self):
        return sum(DEG_NR_COEFFS[: self.sh_deg + 1])

    def setup(self):
        assert self.sh_deg < 4
        self.neural_textures = [
            NeuralTexture(
                res=(int(self.deg_res[deg]), int(self.deg_res[deg])),
                nr_channels=self.nr_channels * DEG_NR_COEFFS[deg],
                val_range=(-float(self.sh_range[deg]), float(self.sh_range[deg])),
                anchor=self.anchor,
                lerp=self.lerp,
                quantize_output=self.quantize_output,
                squeeze_output=self.squeeze_output,
                align_to_webgl=self.align_to_webgl,
                mlp_dtype=self.mlp_dtype,
            )
            for deg in range(self.sh_deg + 1)
        ]

    def coeffs(self, uv_coords, bake: bool = False):
        """[N, C, nr_coeffs] SH coefficients at uv."""
        outs = []
        for deg in range(self.sh_deg + 1):
            r = self.neural_textures[deg](uv_coords, bake)
            outs.append(r.reshape(*r.shape[:-1], self.nr_channels, DEG_NR_COEFFS[deg]))
        return jnp.concatenate(outs, axis=-1)

    def __call__(self, uv_coords, view_dirs=None):
        coeffs = self.coeffs(uv_coords)
        if view_dirs is None:
            return coeffs
        # SH evaluation in float16 (WebGL parity, sh_neural_textures.py:88-96)
        raw = sh_eval(
            coeffs.astype(jnp.float16), view_dirs.astype(jnp.float16), self.sh_deg
        )
        return jax.nn.sigmoid(raw.astype(jnp.float32))

    def bake_band(self, deg: int, uv_coords):
        """Raw squeezed band values at texel-center uvs (for the baker)."""
        return self.neural_textures[deg](uv_coords, bake=True)
