"""Phong shading with hard shadows.

Reproduces worker/shared/tracer/tracer.go:53-77 `phong`:
  - colour starts at the material's ambient Ka (tracer.go:56)
  - per light: a shadow ray from the hit point, offset by 1e-4 along the
    light direction (tracer.go:64); the point is lit iff there is no blocker
    closer than the light (hits *beyond* the light do not shadow)
  - diffuse:  Kd * max(L.N, 0) * Lcol       (tracer.go:70)
  - specular: Ks * max(R.V, 0)^Ns * Lcol    (tracer.go:73), R the reflection
    of L about N, V toward the camera; Go's math.Pow(0,0)=1 convention applies
    (Ns=0 materials get full Ks when lit), matching jnp.power
  - all additions saturate at 1.0 per channel (colour.go:38-41). Because
    every contribution is non-negative, sequential saturating adds equal a
    single clamp of the sum — we accumulate then clamp once.
  - the normal is the smooth interpolated vertex normal, or the flat face
    normal for meshes without normals (object.go:91-96; the flat case is
    handled at bake time by writing the face normal into all vertex slots)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.models.scene import SceneArrays
from distributed_raytracer_tpu.ops import intersect
from distributed_raytracer_tpu.utils.config import RenderConfig, DEFAULT_CONFIG


def _normalize(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def shade(scene: SceneArrays, cam_pos: jnp.ndarray, origins: jnp.ndarray,
          dirs: jnp.ndarray, hits: intersect.Hits,
          cfg: RenderConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Shade each ray's nearest hit; unhit rays are black (tracer.go:88-90).

    origins: (3,) shared or (C, 3); dirs: (C, 3); returns (C, 3) float32.
    """
    t = jnp.where(hits.valid, hits.t, 0.0)  # keep hit-point math finite
    u, v, x = intersect.barycentrics_at(scene, origins, dirs, t, hits.tri)
    r1 = 1.0 - u - v

    n0 = scene.n0[hits.tri]
    n1 = scene.n1[hits.tri]
    n2 = scene.n2[hits.tri]
    normal = _normalize(r1[:, None] * n0 + u[:, None] * n1 + v[:, None] * n2)

    mat = scene.mat_id[hits.tri]
    ka = scene.mat_ka[mat]
    kd = scene.mat_kd[mat]
    ks = scene.mat_ks[mat]
    ns = scene.mat_ns[mat]

    cam_dir = _normalize(cam_pos[None, :] - x)  # V, toward the camera (tracer.go:66)

    def per_light(colour, light):
        lpos, lcol = light
        to_light = lpos[None, :] - x
        ldist = jnp.linalg.norm(to_light, axis=-1)
        ldir = to_light / ldist[:, None]

        # Shadow ray: origin offset 1e-4 along the light direction
        # (tracer.go:64) plus a float32-robustness lift along the geometric
        # normal, signed toward the light's side of the surface — this keeps
        # clearance from the surface plane at grazing light angles, where
        # the along-light offset alone collapses and f32 rounding produces
        # shadow acne (see RenderConfig.shadow_normal_offset).
        geo = _normalize(scene.geo_n[hits.tri])
        side = jnp.where(jnp.einsum("cd,cd->c", geo, ldir) >= 0.0, 1.0, -1.0)
        sh_origin = (x + cfg.shadow_offset * ldir
                     + (cfg.shadow_normal_offset * side)[:, None] * geo)
        shadowed = intersect.any_hit(scene, sh_origin, ldir,
                                     ldist - cfg.shadow_offset,
                                     exclude=hits.tri)

        l_dot_n = jnp.einsum("cd,cd->c", ldir, normal)
        diff = jnp.maximum(l_dot_n, 0.0)
        refl = 2.0 * l_dot_n[:, None] * normal - ldir
        spec = jnp.power(jnp.maximum(jnp.einsum("cd,cd->c", refl, cam_dir), 0.0), ns)

        contrib = (kd * diff[:, None] + ks * spec[:, None]) * lcol[None, :]
        lit = jnp.logical_not(shadowed)
        return colour + jnp.where(lit[:, None], contrib, 0.0), None

    colour, _ = jax.lax.scan(per_light, ka, (scene.light_pos, scene.light_col))
    colour = jnp.minimum(colour, 1.0)  # saturating adds collapsed to one clamp
    return jnp.where(hits.valid[:, None], colour, 0.0)
