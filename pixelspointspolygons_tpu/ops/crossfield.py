"""Cross-field (frame-field) algebra on native complex64 arrays.

The frame field at each pixel is the root set of f(z) = z^4 + c2 z^2 + c0,
encoding two direction pairs {±u, ±v}. The network emits 4 real channels
(Re c0, Im c0, Re c2, Im c2).

Behavioral spec from the reference (re-derived, not translated):
- models/ffl/frame_field_utils.py:9-20  framefield_align_error = |f(z)|^2
- models/ffl/frame_field_utils.py:43-52 c0c2_to_uv root extraction
- models/ffl/frame_field_utils.py:55-68 compute_closest_in_uv
- ffl_submodules/.../lydorn_utils/math_utils.py:133-146 c0c2 <-> uv
- models/ffl/frame_field_utils.py:23-40 Laplacian smoothness penalty

TPU note: complex64 lowers to interleaved real pairs in XLA; all ops here are
elementwise/conv and fuse cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def crossfield_to_c0c2(crossfield: jnp.ndarray, channel_axis: int = 1):
    """Split a 4-real-channel crossfield into complex (c0, c2).

    crossfield: (..., 4, ...) with channels [Re c0, Im c0, Re c2, Im c2].
    """
    c0r, c0i, c2r, c2i = jnp.split(crossfield, 4, axis=channel_axis)
    sq = lambda a: jnp.squeeze(a, axis=channel_axis)
    c0 = lax.complex(sq(c0r), sq(c0i))
    c2 = lax.complex(sq(c2r), sq(c2i))
    return c0, c2


def uv_to_c0c2(u: jnp.ndarray, v: jnp.ndarray):
    """c0 = u^2 v^2, c2 = -(u^2 + v^2) — so that f(z)=(z^2-u^2)(z^2-v^2)."""
    u2, v2 = u * u, v * v
    return u2 * v2, -(u2 + v2)


def framefield_align_error(c0: jnp.ndarray, c2: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """|z^4 + c2 z^2 + c0|^2 — zero iff direction z (unit complex) lies on the field."""
    z2 = z * z
    f = z2 * z2 + c2 * z2 + c0
    return jnp.real(f) ** 2 + jnp.imag(f) ** 2


def c0c2_to_uv(c0: jnp.ndarray, c2: jnp.ndarray):
    """Recover the two direction pairs: u,v with u^2,v^2 = roots of w^2+c2 w+c0.

    Returns (u, v) complex arrays, same shape as c0.
    """
    disc = jnp.sqrt(c2 * c2 - 4.0 * c0)
    u2 = -(c2 + disc) / 2.0
    v2 = -(c2 - disc) / 2.0
    return jnp.sqrt(u2), jnp.sqrt(v2)


def closest_in_uv(directions: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """0 where direction is closer to {±u}, 1 where closer to {±v}.

    directions: complex (...); u, v: complex broadcastable to directions.
    Alignment score = |Re(dir)*Re(w) + Im(dir)*Im(w)| (dot of 2-vectors);
    the *smaller* |dot| with the orthogonal-ish axis decides, matching the
    reference's argmin over |uv·dir| (frame_field_utils.py:64-68).
    """
    dot_u = jnp.abs(jnp.real(u) * jnp.real(directions) + jnp.imag(u) * jnp.imag(directions))
    dot_v = jnp.abs(jnp.real(v) * jnp.real(directions) + jnp.imag(v) * jnp.imag(directions))
    return (dot_v < dot_u).astype(jnp.int32)


_LAPLACIAN = jnp.array(
    [[0.5, 1.0, 0.5], [1.0, -6.0, 1.0], [0.5, 1.0, 0.5]], dtype=jnp.float32
) / 12.0


def laplacian_penalty(x: jnp.ndarray) -> jnp.ndarray:
    """|Laplacian(x)| per channel. x: (B, C, H, W) real."""
    b, c, h, w = x.shape
    k = jnp.tile(_LAPLACIAN[None, None], (c, 1, 1, 1))  # (C,1,3,3)
    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    return jnp.abs(out)


def angle_to_z(angle: jnp.ndarray) -> jnp.ndarray:
    """Unit complex from angle (radians)."""
    return lax.complex(jnp.cos(angle), jnp.sin(angle))
