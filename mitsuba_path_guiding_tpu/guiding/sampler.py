"""Guided directional sampling: one-sample MIS between BSDF and the guiding
mixture.

The guided-integrator sampling step the reference fork hosts (guided plugins
combine BSDF sampling with the OpenPGL field exactly this way): with
selection probability ``alpha`` draw from the spatial cache's vMF mixture,
else from the BSDF; the estimator divides by the combined density
alpha * p_guide + (1 - alpha) * p_bsdf, which keeps the estimator unbiased
for any cache contents.  Delta BSDF lobes bypass guiding entirely.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import cos_theta
from mitsuba_path_guiding_tpu.guiding.grid import (
    GuidingGrid,
    cell_index,
    guide_pdf,
    guide_sample,
)
from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.scene.types import BSDFType


def _is_delta_material(mats, mid):
    t = mats.type[mid]
    return (
        (t == BSDFType.CONDUCTOR) | (t == BSDFType.DIELECTRIC)
        | (t == BSDFType.NULL) | (t == BSDFType.THINDIELECTRIC)
    )


from functools import lru_cache


@lru_cache(maxsize=64)
def make_guide_fn(alpha: float = 0.5, mat_types=bsdf_mod.ALL_TYPES, product: bool = False,
                  levels: int | None = None, parallax: bool = False,
                  min_rough: float = 0.0):
    """Returns the ``guide`` callback consumed by integrators.path.trace.
    ``mat_types`` (static) restricts BSDF compilation to families present.

    Cached so identical configs return the SAME function object — the
    callback is a static jit argument, so object identity is the cache key.
    (Also used with alpha=0 as the default unguided sampling path: on TPU
    this code shape compiles ~2x faster per wave than the plain
    sample-then-continue form; see tools/ablate.py.)"""

    def _params_and_alpha(grid: GuidingGrid, mats, mid, p, frame):
        """Shared cell gather + per-lane guide fraction for sample/pdf."""
        from mitsuba_path_guiding_tpu.guiding.grid import (
            MAX_REFINE_LEVELS,
            _gather_cells,
        )

        cid = cell_index(grid, p, levels=MAX_REFINE_LEVELS if levels is None else levels)
        # one packed gather pass; the extra row is the learned per-cell
        # BSDF fraction (fit.py update_grid alpha_scale — round 5)
        params, a_scale = _gather_cells(grid, cid, with_alpha=True)
        if parallax:
            # parallax-aware mean reprojection (Ruppert et al. 2020):
            # re-aim each lobe at its fitted virtual source from p; the
            # reprojected mixture is used for BOTH sampling and pdf, so
            # the one-sample-MIS estimator stays exact
            from mitsuba_path_guiding_tpu.guiding.grid import parallax_params

            params = parallax_params(grid, cid, params, p)
        if product:
            # product importance sampling: mixture x cosine-lobe vMF proxy
            # around the shading normal (exact pdf for the distribution
            # actually sampled -> estimator stays unbiased)
            from mitsuba_path_guiding_tpu.guiding.grid import product_params

            params = product_params(params, frame.n)
        valid = params[-1]
        usable = valid & ~_is_delta_material(mats, mid)
        if min_rough > 0.0:
            # glossy gating (the practical-path-guiding BSDF-fraction
            # heuristic): a coarse cache mixture cannot out-sample a
            # narrow BSDF lobe — guide only lobes at least this rough;
            # diffuse-class families always qualify
            t = mats.type[mid]
            diffuseish = (
                (t == BSDFType.DIFFUSE) | (t == BSDFType.ROUGH_DIFFUSE)
                | (t == BSDFType.DIFFTRANS) | (t == BSDFType.CLOTH)
            )
            usable = usable & (diffuseish | (mats.alpha[mid] >= min_rough))
        return params, jnp.where(usable, alpha * a_scale, 0.0)

    def guide(grid: GuidingGrid, mats, mid, p, frame, wi_local, u3, u_sel,
              u_lobe, tex=None, cloth_aux=None):
        from mitsuba_path_guiding_tpu.guiding.grid import (
            _mixture_pdf,
            _mixture_sample,
        )

        params, a = _params_and_alpha(grid, mats, mid, p, frame)

        # BSDF branch (also supplies the delta path)
        bs = bsdf_mod.sample(mats, mid, wi_local, u3, types=mat_types,
                             tex=tex, cloth_aux=cloth_aux)
        # guiding branch
        d_guided = _mixture_sample(params, u_lobe, u3[..., 0:2])
        wo_guided = frame.to_local(d_guided)

        take_guide = (u_sel < a) & ~bs.is_delta
        wo_local = jnp.where(take_guide[..., None], wo_guided, bs.wo)
        wo_world = frame.to_world(wo_local)

        # combined density at the ONE chosen direction (skip for delta lobes)
        f, pdf_b = bsdf_mod.eval_pdf(mats, mid, wi_local, wo_local,
                                     types=mat_types, tex=tex,
                                     cloth_aux=cloth_aux)
        pdf_g = _mixture_pdf(params, wo_world)
        pdf_comb = a * pdf_g + (1.0 - a) * pdf_b
        w_smooth = f / jnp.maximum(pdf_comb, 1e-8)[..., None]
        ok = pdf_comb > 1e-9

        use_bsdf_native = bs.is_delta | (a <= 0.0)
        weight = jnp.where(use_bsdf_native[..., None], bs.weight, jnp.where(ok[..., None], w_smooth, 0.0))
        pdf = jnp.where(use_bsdf_native, bs.pdf, pdf_comb)
        return wo_world, pdf, weight, bs.is_delta

    def pdf_at(grid: GuidingGrid, mats, mid, p, frame, dir_world,
               pdf_bsdf):
        """Density the GUIDED direction strategy assigns to an arbitrary
        direction — the quantity NEE's MIS weight must use.  Round-4
        bias fix: weighting NEE with the plain BSDF pdf while the
        emission-hit side uses the combined density makes the two MIS
        weights sum past 1 wherever the cache concentrates probability
        on the light (measured: bounce-lamp guided mean 3x the
        reference at 64 spp; exact repro in
        tests/test_guiding.py::test_guided_nee_mis_consistency)."""
        from mitsuba_path_guiding_tpu.guiding.grid import _mixture_pdf

        params, a = _params_and_alpha(grid, mats, mid, p, frame)
        pg = _mixture_pdf(params, dir_world)
        return a * pg + (1.0 - a) * pdf_bsdf

    guide.alpha = alpha  # exposed for medium-event mixing (volpath)
    guide.pdf_at = pdf_at
    return guide
