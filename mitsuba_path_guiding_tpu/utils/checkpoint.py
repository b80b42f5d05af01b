"""Checkpoint / resume: film accumulation + guiding cache + sample counters.

Beyond the reference's film-level restartability (partial-image flush
mitsuba.cpp:105-125, -x skip, fork Denoiser::storeBuffers/loadBuffers —
SURVEY.md §5.4 notes it has *no* mid-render state checkpointing), this
persists the full render state: film weights, per-pixel sample counter,
progression index, and the guiding cache with its EMA statistics — the
orbax-style checkpoint SURVEY.md §5.4 calls for, as a plain .npz.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def save_renderer_state(renderer, path: str) -> None:
    from mitsuba_path_guiding_tpu.guiding.grid import GuidingGrid

    data = {
        "rgb_weight": np.asarray(renderer.film.rgb_weight),
        "width": renderer.film.width,
        "height": renderer.film.height,
        "sample_counter": renderer.sample_counter,
        "progression": renderer.progression,
    }
    if renderer.grid is not None:
        for field in GuidingGrid._fields:
            data[f"grid_{field}"] = np.asarray(getattr(renderer.grid, field))
    np.savez_compressed(path, **data)


def load_renderer_state(renderer, path: str) -> None:
    from mitsuba_path_guiding_tpu.film.film import Film
    from mitsuba_path_guiding_tpu.guiding.grid import GuidingGrid

    z = np.load(path)
    renderer.film = Film(
        rgb_weight=jnp.asarray(z["rgb_weight"]),
        width=int(z["width"]),
        height=int(z["height"]),
    )
    renderer.sample_counter = int(z["sample_counter"])
    renderer.progression = int(z["progression"])
    if renderer.grid is not None and "grid_mu" in z:
        renderer.grid = GuidingGrid(
            **{f: jnp.asarray(z[f"grid_{f}"]) for f in GuidingGrid._fields}
        )
