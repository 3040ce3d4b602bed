"""The 7-operator tonemap family, as differentiable array epilogues.

Re-derivations of the reference's free functions
(RaytracingEngine.cpp:70-214), operating on HDR arrays [..., 3]:

  simple                       clamp01                        (:123-131)
  reinhard_simple              c / (c+1)                      (:133-135)
  reinhard_extended            c * (1 + c/w^2) / (1 + c), w=5 (:137-141)
  reinhard_extended_luminance  luminance-space extended, Rec.709 weights
                               (0.2126, 0.7152, 0.0722)       (:100-110, :143-148)
  reinhard_jodie               a=0.18 log-based L map         (:150-154)
  uncharted2                   Hable filmic, exposureBias=2, W=11.2
                               (:78-87, :156-163)
  aces_approx                  Narkowicz ACES fit, v*=0.6     (:89-98)

The reference computes in double but writes several curve constants as
float literals (0.15f, 2.51f, ...); we reproduce those constants rounded
through float32 so the fp64 golden path matches C++ bit-for-bit.

`to_uint8` is toColor (:113-121): clamp01 then TRUNCATING cast of v*255
(static_cast<uint8_t>, not rounding).

`change_luminance` divides by the input luminance with no zero guard
(:106-110) — exactly like the reference; luminance-space operators on a
pure-black pixel produce non-finite values there too.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_F32 = lambda x: float(np.float32(x))

#: Rec.709 luminance weights (RaytracingEngine.cpp:100-104).
LUMA_WEIGHTS = (0.2126, 0.7152, 0.0722)


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray(LUMA_WEIGHTS, c.dtype)
    return jnp.sum(c * w, axis=-1)


def change_luminance(c: jnp.ndarray, l_out: jnp.ndarray) -> jnp.ndarray:
    l_in = luminance(c)
    return c * (l_out / l_in)[..., None]


def simple(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(c, 0.0, 1.0)


def reinhard_simple(c: jnp.ndarray) -> jnp.ndarray:
    return c / (c + 1.0)


def reinhard_extended(c: jnp.ndarray, max_white: float = 5.0) -> jnp.ndarray:
    white_sq = max_white * max_white
    return (c * (c / white_sq + 1.0)) / (c + 1.0)


def reinhard_extended_luminance(
    c: jnp.ndarray, max_white: float = 5.0
) -> jnp.ndarray:
    l_old = luminance(c)
    l_new = (l_old * (1.0 + l_old / (max_white * max_white))) / (1.0 + l_old)
    return change_luminance(c, l_new)


def reinhard_jodie(c: jnp.ndarray, a: float = 0.18) -> jnp.ndarray:
    l = luminance(c)
    l_mapped = (a / jnp.log(2.0 + (l / 0.85) ** 1.7)) * jnp.log(1.0 + l)
    return change_luminance(c, l_mapped)


def _uncharted2_partial(x: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d, e, f = (
        _F32(0.15),
        _F32(0.50),
        _F32(0.10),
        _F32(0.20),
        _F32(0.02),
        _F32(0.30),
    )
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def uncharted2(c: jnp.ndarray) -> jnp.ndarray:
    exposure_bias = 2.0
    curr = _uncharted2_partial(c * exposure_bias)
    w = jnp.full((3,), 11.2, c.dtype)
    white_scale = 1.0 / _uncharted2_partial(w)
    return curr * white_scale


def aces_approx(c: jnp.ndarray) -> jnp.ndarray:
    v = c * _F32(0.6)
    a, b, cc, d, e = _F32(2.51), _F32(0.03), _F32(2.43), _F32(0.59), _F32(0.14)
    return jnp.clip((v * (a * v + b)) / (v * (cc * v + d) + e), 0.0, 1.0)


#: Name -> operator, in the reference's export order
#: (RaytracingEngine.cpp:303-311).
OPERATORS = {
    "simple": simple,
    "reinhard_simple": reinhard_simple,
    "reinhard_extended": reinhard_extended,
    "reinhard_extended_luminance": reinhard_extended_luminance,
    "reinhard_jodie": reinhard_jodie,
    "uncharted2": uncharted2,
    "aces": aces_approx,
}


def tonemap(hdr: jnp.ndarray, operator: str = "aces") -> jnp.ndarray:
    """Apply one operator (the reference's `tonemap` applies ACES,
    RaytracingEngine.cpp:165-174)."""
    return OPERATORS[operator](hdr)


def tonemap_all(hdr: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """All 7 operators (tonemapAll, RaytracingEngine.cpp:176-214)."""
    return {name: op(hdr) for name, op in OPERATORS.items()}


def to_uint8(mapped: jnp.ndarray) -> jnp.ndarray:
    """toColor (RaytracingEngine.cpp:113-121): clamp01, * 255, truncate."""
    return (jnp.clip(mapped, 0.0, 1.0) * 255.0).astype(jnp.uint8)
