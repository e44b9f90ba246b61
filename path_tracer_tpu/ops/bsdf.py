"""BSDF sampling — diffuse / specular / refractive, as masked vector lanes.

Parity with the reference's ``radiance`` branches (``mod.rs:687-788``):

- Diffuse: cosine-weighted hemisphere sample in a tangent frame whose first
  axis comes from (0,1,0) or (1,0,0) depending on |w.x| > 0.1.
- Specular: perfect mirror about the geometric normal.
- Refract: glass nc=1.0 / nt=1.5, total-internal-reflection fallback, Schlick
  Fresnel with R0 = ((nt-nc)/(nt+nc))^2, branch probability P = 0.25+0.5*Re.

Wavefront transform note (expectation-preserving): for new_depth <= 2 the
reference evaluates BOTH refraction branches and sums re*L_refl + tr*L_trans
(``mod.rs:760-786``). A wavefront lane can only follow one path, so we always
Russian-roulette the branch with probability P and weights Re/P, Tr/(1-P) —
the estimator's expectation is identical (E[w·L] = re·L_refl + tr·L_trans for
any branch probability), at slightly higher variance for the first two
bounces. Verified against a literal recursive oracle in tests/test_integrator.py (test_wavefront_matches_recursive_oracle).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

PI = 3.141592653589793
NC = 1.0  # index of refraction, air
NT = 1.5  # index of refraction, glass


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _normalize(v):
    return v * lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))


class BsdfSample(NamedTuple):
    direction: jax.Array  # [R,3] next ray direction
    weight: jax.Array  # [R,1] path weight multiplier (beyond material color)


def sample_diffuse(nl, u1, u2) -> jax.Array:
    """Cosine-weighted hemisphere around nl (mod.rs:687-715). u1,u2: [R,1]."""
    r1 = 2.0 * PI * u1
    r2 = u2
    r2s = jnp.sqrt(r2)
    w = nl
    # u axis: (|w.x| > 0.1 ? (0,1,0) : (1,0,0)) × w, normalized
    use_y = jnp.abs(w[:, 0:1]) > 0.1
    up = jnp.where(
        use_y,
        jnp.array([0.0, 1.0, 0.0], jnp.float32)[None, :],
        jnp.array([1.0, 0.0, 0.0], jnp.float32)[None, :],
    )
    u = _normalize(jnp.cross(up, w))
    v = jnp.cross(w, u)
    d = u * (jnp.cos(r1) * r2s) + v * (jnp.sin(r1) * r2s) + w * jnp.sqrt(1.0 - r2)
    return _normalize(d)


def reflect(d, n) -> jax.Array:
    """Mirror reflection d - n*2*(n·d). Sign-invariant in n."""
    return d - n * (2.0 * _dot(n, d))


def sample_refract(d, n, nl, u_branch):
    """Dielectric refraction lane (mod.rs:729-788).

    d: incoming direction [R,3]; n: geometric outward normal; nl: normal
    flipped toward the ray; u_branch: [R,1] uniform for branch RR.
    Returns (direction, weight).
    """
    refl = reflect(d, n)
    into = _dot(n, nl) > 0.0  # [R,1]
    nnt = jnp.where(into, NC / NT, NT / NC)
    ddn = _dot(d, nl)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0

    # (into ? 1 : -1) * n == nl, so the transmitted direction uses nl:
    tdir = _normalize(d * nnt - nl * (ddn * nnt + jnp.sqrt(jnp.maximum(cos2t, 0.0))))

    r0 = ((NT - NC) / (NT + NC)) ** 2
    c = 1.0 - jnp.where(into, -ddn, _dot(tdir, n))
    re = r0 + (1.0 - r0) * c**5
    tr = 1.0 - re
    p = 0.25 + 0.5 * re

    pick_refl = u_branch < p
    direction = jnp.where(pick_refl, refl, tdir)
    weight = jnp.where(pick_refl, re / p, tr / (1.0 - p))

    direction = jnp.where(tir, refl, direction)
    weight = jnp.where(tir, 1.0, weight)
    return direction, weight


def sample_bsdf(d, n, nl, rtype, u) -> BsdfSample:
    """Evaluate all three BSDF lanes under masks and select by rtype.

    d [R,3]: incoming; n [R,3]: outward geometric normal; nl [R,3]: normal
    toward ray; rtype [R] i32; u [R,3]: uniforms (u1, u2, u_branch).
    """
    u1, u2, ub = u[:, 0:1], u[:, 1:2], u[:, 2:3]
    d_diff = sample_diffuse(nl, u1, u2)
    d_spec = _normalize(reflect(d, n))  # normalize: no-op mathematically
    d_refr, w_refr = sample_refract(d, n, nl, ub)

    rt = rtype[:, None]
    direction = jnp.where(rt == 0, d_diff, jnp.where(rt == 1, d_spec, d_refr))
    weight = jnp.where(rt == 2, w_refr, 1.0)
    return BsdfSample(direction=direction, weight=weight)
