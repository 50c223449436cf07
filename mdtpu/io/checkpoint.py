"""Full-state binary checkpointing (positions, velocities, images, RNG key,
step counter, compensation buffers) so NVE runs resume *exactly*.

This goes beyond the reference, whose only resume path is re-reading an
Extended-XYZ snapshot — positions/box/diameters only, losing velocities,
images and RNG state (SURVEY.md section 5, checkpoint row;
/root/reference/src/initialization.jl:77-80). XYZ interop is still available
via mdtpu.io.xyz for compatibility.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_ARRAY_FIELDS = [
    "positions", "velocities", "forces", "images", "diameters",
    "unitcell", "unitcell_inv", "key", "step", "nf",
    "energy", "virial", "temperature", "pos_comp", "vel_comp",
    "virial_accum", "nprom",
]


def save_checkpoint(state, filepath):
    data = {}
    for name in _ARRAY_FIELDS:
        val = getattr(state, name)
        if val is None:
            continue
        if name == "key":
            val = jax.random.key_data(val)
        data[name] = np.asarray(val)
    np.savez(filepath, **data)


def load_checkpoint(filepath, template_state):
    """Load a checkpoint into the pytree structure of ``template_state``
    (same shapes/dtypes; neighbor state is rebuilt lazily by the engine)."""
    with np.load(filepath) as data:
        updates = {}
        for name in _ARRAY_FIELDS:
            if name not in data:
                continue
            val = data[name]
            tmpl = getattr(template_state, name)
            if name == "key":
                # Match the TEMPLATE's key representation: rewrapping a raw
                # uint32 key as a typed key<fry> changes the pytree leaf's
                # dtype/shape, invalidating every program compiled against
                # the original signature (a fresh ~60 s TPU compile per
                # program) — and wrap_key_data under a non-threefry
                # jax_default_prng_impl would mis-wrap the stored words.
                if tmpl is not None and jnp.issubdtype(
                        jnp.asarray(tmpl).dtype, jax.dtypes.prng_key):
                    updates[name] = jax.random.wrap_key_data(
                        jnp.asarray(val),
                        impl=jax.random.key_impl(tmpl))
                else:
                    updates[name] = jnp.asarray(
                        val, dtype=None if tmpl is None
                        else jnp.asarray(tmpl).dtype)
            elif tmpl is not None:
                updates[name] = jnp.asarray(val, dtype=jnp.asarray(tmpl).dtype)
            else:
                updates[name] = jnp.asarray(val)
    return template_state.replace(**updates)
