"""Triplane field + MLP decoders, functional JAX (params = pytrees).

Equivalents of the reference modules:
  - TriPlane (hugs/models/modules/triplane.py:14-40): three learned
    feature planes, bilinear-sampled (align_corners) at normalized xyz
    pairs, concatenated to 3F features.
  - AppearanceDecoder / DeformationDecoder / GeometryDecoder
    (hugs/models/modules/decoders.py:24-111), including the shared-trunk
    multi-head structure, gelu activations, weight-normalized skinning
    layer, zero-initialized blendshape head, and the (N,621)->(207,3N)
    posedirs reshape.

Linear layers use torch's default init (uniform +-1/sqrt(fan_in)) so
training dynamics match the reference's starting point.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp

from hugs_tpu.ops.grid_sample import grid_sample_2d

TRIPLANE_EPS = 1e-3


# ------------------------------------------------------------- primitives

def linear_init(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), minval=-bound,
                                maxval=bound),
        "b": jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound),
    }


def linear(p, x):
    return x @ p["w"] + p["b"]


def sine_init(a: float = 1.0):
    """SineActivation parameter (reference hugs/models/modules/
    activation.py:10-16: y = sin(a*x) with a learnable scalar `a`).
    Dead in the release path; provided for decoder act-fn parity."""
    return {"a": jnp.ones(1) * a}


def sine_apply(p, x):
    return jnp.sin(p["a"] * x)


def weight_norm_init(key, fan_in, fan_out):
    p = linear_init(key, fan_in, fan_out)
    g = jnp.linalg.norm(p["w"], axis=0)          # per-output-column norm
    return {"v": p["w"], "g": g, "b": p["b"]}


def weight_norm_linear(p, x):
    w = p["v"] / jnp.clip(jnp.linalg.norm(p["v"], axis=0, keepdims=True),
                          1e-12) * p["g"]
    return x @ w + p["b"]


# --------------------------------------------------------------- triplane

def triplane_init(key, features: int = 32, res: int = 256):
    ks = jax.random.split(key, 3)
    shape = (res, res, features)
    return {
        "plane_xy": jax.random.normal(ks[0], shape),
        "plane_xz": jax.random.normal(ks[1], shape),
        "plane_yz": jax.random.normal(ks[2], shape),
    }


def triplane_apply(params, x: jnp.ndarray, center: float = 0.0,
                   scale: float = 2.0) -> jnp.ndarray:
    """x: (N, 3) world coords in roughly [-scale/2, scale/2] around center.
    Returns (N, 3F). Plane layout is (H=second coord, W=first coord) to
    match F.grid_sample's (x->W, y->H) convention."""
    u = (x - center) / scale + 0.5            # [0, 1]
    u = u * 2.0 - 1.0                         # [-1, 1]
    f_xy = grid_sample_2d(params["plane_xy"], u[:, (0, 1)])
    f_xz = grid_sample_2d(params["plane_xz"], u[:, (0, 2)])
    f_yz = grid_sample_2d(params["plane_yz"], u[:, (1, 2)])
    return jnp.concatenate([f_xy, f_xz, f_yz], axis=-1)


# --------------------------------------------------------------- decoders

def appearance_decoder_init(key, n_features: int, hidden: int = 64):
    ks = jax.random.split(key, 4)
    return {
        "net0": linear_init(ks[0], n_features, hidden),
        "net1": linear_init(ks[1], hidden, hidden),
        "opacity": linear_init(ks[2], hidden, 1),
        "shs": linear_init(ks[3], hidden, 16 * 3),
    }


def appearance_decoder_apply(p, feats):
    h = jax.nn.gelu(linear(p["net1"], jax.nn.gelu(linear(p["net0"], feats))))
    return {
        "shs": linear(p["shs"], h),
        "opacity": jax.nn.sigmoid(linear(p["opacity"], h)),
    }


def geometry_decoder_init(key, n_features: int, hidden: int = 128,
                          use_surface: bool = False):
    ks = jax.random.split(key, 5)
    return {
        "net0": linear_init(ks[0], n_features, hidden),
        "net1": linear_init(ks[1], hidden, hidden),
        "xyz": linear_init(ks[2], hidden, 3),
        "rotations": linear_init(ks[3], hidden, 6),
        "scales": linear_init(ks[4], hidden, 2 if use_surface else 3),
    }


def geometry_decoder_apply(p, feats):
    h = jax.nn.gelu(linear(p["net1"], jax.nn.gelu(linear(p["net0"], feats))))
    return {
        "xyz": linear(p["xyz"], h),
        "rotations": linear(p["rotations"], h),
        "scales": jax.nn.gelu(linear(p["scales"], h)),
    }


def deformation_decoder_init(key, n_features: int, hidden: int = 128,
                             disable_posedirs: bool = False):
    ks = jax.random.split(key, 5)
    p = {
        "net0": linear_init(ks[0], n_features, hidden),
        "net1": linear_init(ks[1], hidden, hidden),
        "skinning_linear": weight_norm_init(ks[2], hidden, hidden),
        "skinning": linear_init(ks[3], hidden, 24),
    }
    if not disable_posedirs:
        # zero-init so predicted posedirs start as no-op (decoders.py:67-70)
        p["blendshapes"] = {"w": jnp.zeros((hidden, 3 * 207)),
                            "b": jnp.zeros(3 * 207)}
    return p


def deformation_decoder_apply(p, feats):
    h = jax.nn.gelu(linear(p["net1"], jax.nn.gelu(linear(p["net0"], feats))))
    lbs = linear(p["skinning"],
                 jax.nn.gelu(weight_norm_linear(p["skinning_linear"], h)))
    out = {"lbs_weights": jax.nn.gelu(lbs), "posedirs": None}
    if "blendshapes" in p:
        pd = linear(p["blendshapes"], h)       # (N, 621)
        out["posedirs"] = pd.reshape(207, -1)  # (207, 3N), reference layout
    return out
