"""Neural-gaussian attribute decoders + appearance embedding.

Reference: mlp_opacity/mlp_cov/mlp_color/mlp_feature_bank
(/root/reference/scene/gaussian_model.py:307-339) and Embedding
(/root/reference/scene/embedding.py).  All consume the per-anchor local
view vector [feat | dir (| dist) | geo_fea(64)] and emit per-offset
attributes for the K=n_offsets gaussians of each anchor.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from splatco_tpu.models.mlp import init_mlp, mlp

GEO_DIM = 64  # geo_fea width from CSCM (2 x 32)


def init_decoders(key, feat_dim: int, n_offsets: int,
                  appearance_dim: int = 0, use_feat_bank: bool = False,
                  add_opacity_dist: bool = False, add_cov_dist: bool = False,
                  add_color_dist: bool = False, num_cameras: int = 0
                  ) -> Dict[str, Any]:
    k_op, k_cov, k_col, k_fb, k_app = jax.random.split(key, 5)
    od = 1 if add_opacity_dist else 0
    cd = 1 if add_cov_dist else 0
    cld = 1 if add_color_dist else 0
    params = {
        "opacity": init_mlp(k_op, [feat_dim + 3 + od + GEO_DIM, feat_dim,
                                   n_offsets]),
        "cov": init_mlp(k_cov, [feat_dim + 3 + cd + GEO_DIM, feat_dim,
                                7 * n_offsets]),
        "color": init_mlp(k_col, [feat_dim + 3 + cld + appearance_dim
                                  + GEO_DIM, feat_dim, 3 * n_offsets]),
    }
    if use_feat_bank:
        params["feature_bank"] = init_mlp(k_fb, [3 + 1, feat_dim, 3])
    if appearance_dim > 0:
        # per-camera appearance table (reference Embedding,
        # /root/reference/scene/embedding.py:53-81, indexed by camera uid at
        # gaussian_renderer/__init__.py:76-86).  Always created when
        # appearance_dim > 0 — the reference default config has it on.
        rows = max(num_cameras, 1)
        params["appearance"] = {
            "table": jax.random.normal(k_app, (rows, appearance_dim))
        }
    return params


def opacity_mlp(params, x):
    return mlp(params["opacity"], x, final_act="tanh")


def cov_mlp(params, x):
    return mlp(params["cov"], x)


def color_mlp(params, x):
    return mlp(params["color"], x, final_act="sigmoid")


def feature_bank_mlp(params, x):
    return mlp(params["feature_bank"], x, final_act="softmax")


def appearance_embedding(params, cam_uid, n: int):
    table = params["appearance"]["table"]
    uid = jnp.clip(jnp.asarray(cam_uid, jnp.int32), 0, table.shape[0] - 1)
    return jnp.broadcast_to(table[uid][None, :], (n, table.shape[1]))
