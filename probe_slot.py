"""Decompose the slot-mode NVT step at bench geometry on the real TPU."""
import json
import time

import jax

from mdtpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from bench import build


def timed(advance, state, label, iters=400):
    s = advance(state, 2)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = advance(state, iters)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"probe": label, "ms": round(dt, 4)}), flush=True)
    return s


def main():
    from mdtpu.core.types import NVE, NVT, Parameters
    from mdtpu.integrate.slot_step import make_slot_step
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones

    n, rho, temp = 65536, 0.8, 1.0
    state, advance = build(slot=True)
    state = advance(state, 200)
    jax.block_until_ready(state)

    timed(advance, state, "nvt_slot_step")

    pot = LennardJones(r_cut=2.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    eng = CellGridEngine.create(pot, 2.5, 0.3, np.asarray(state.unitcell), n,
                                cell_capacity=30)

    nve = make_slot_step(params, NVE(), eng)
    adv_nve = jax.jit(lambda s, k: jax.lax.fori_loop(
        0, k, lambda i, x: nve(x), s))
    timed(adv_nve, state, "nve_slot_step")

    # compute_slots only
    def sweep_only(s, k):
        def body(i, carry):
            e, w, f, nb = eng.compute_slots(carry.positions, carry.diameters,
                                            carry.unitcell,
                                            carry.unitcell_inv, carry.nbrs)
            return carry.replace(energy=e, virial=w, forces=f,
                                 positions=carry.positions + 0.0 * f)
        return jax.lax.fori_loop(0, k, body, s)

    timed(jax.jit(sweep_only), state, "compute_slots_only")

    # monodisperse potential (mixing='none'): skips sigma mixing + diam window
    pot_m = LennardJones(r_cut=2.5, force_shift=True, mixing="none")
    eng_m = CellGridEngine.create(pot_m, 2.5, 0.3, np.asarray(state.unitcell),
                                  n, cell_capacity=30)
    nvt_m = make_slot_step(params.replace(potential=pot_m), NVT(temp, 0.4),
                           eng_m)
    adv_m = jax.jit(lambda s, k: jax.lax.fori_loop(
        0, k, lambda i, x: nvt_m(x), s))
    timed(adv_m, state, "nvt_slot_step_monodisperse")


def variants():
    from mdtpu.core.types import NVE, Parameters
    from mdtpu.integrate import slot_step as ss
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones
    from mdtpu.integrate.step import _add
    from mdtpu.integrate.thermostat import compute_temperature
    import jax.numpy as jnp

    n, rho = 65536, 0.8
    state, advance = build(slot=True)
    state = advance(state, 200)
    jax.block_until_ready(state)
    pot = LennardJones(r_cut=2.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    eng = CellGridEngine.create(pot, 2.5, 0.3, np.asarray(state.unitcell), n,
                                cell_capacity=30)

    def mk(rebin_check, wrap):
        def step(s):
            dt = jnp.float32(0.002)
            half = 0.5 * dt
            cell, cell_inv = s.unitcell, s.unitcell_inv
            if rebin_check:
                dim = 3
                disp = [s.positions[k] - s.nbrs.ref_positions[k] for k in range(dim)]
                frac = ss._frac_components(jnp.stack(disp), cell_inv)
                frac = [f - jnp.round(f) for f in frac]
                d2 = sum(sum(cell[k, j] * frac[j] for j in range(dim)) ** 2
                         for k in range(dim))
                rebuild = jnp.any(d2 > 0.0225)
                s = jax.lax.cond(rebuild, lambda x: ss._rebin(x, eng),
                                 lambda x: x, s)
            occ = s.nbrs.occupied
            v, vc = _add(s.velocities, s.vel_comp, s.forces * half, True)
            x, xc = _add(s.positions, s.pos_comp, v * dt, True)
            if wrap:
                from mdtpu.utils.math import kahan_add
                frac = ss._frac_components(x, cell_inv)
                n_cross = [jnp.where(occ, jnp.floor(f), jnp.zeros_like(f)) for f in frac]
                delta = jnp.stack([-sum(cell[k, j] * n_cross[j] for j in range(3))
                                   for k in range(3)])
                x, xc = kahan_add(x, xc, delta)
                images = s.images + jnp.stack(n_cross).astype(s.images.dtype)
            else:
                images = s.images
            e, w, f, nbrs = eng.compute_slots(x, s.diameters, cell, cell_inv, s.nbrs)
            v, vc = _add(v, vc, f * half, True)
            t = compute_temperature(v, s.nf)
            return s.replace(positions=x, velocities=v, forces=f, images=images,
                             step=s.step + 1, energy=e, virial=w, temperature=t,
                             pos_comp=xc, vel_comp=vc, nbrs=nbrs)
        return jax.jit(lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: step(x), s))

    timed(mk(False, False), state, "nve_no_rebincheck_no_wrap")
    timed(mk(False, True), state, "nve_no_rebincheck")
    timed(mk(True, True), state, "nve_full_manual")


def variants2():
    """Isolate: plain no-rebin fori vs +needs-in-body vs nested-while advance."""
    from mdtpu.core.types import NVT, Parameters
    from mdtpu.integrate import slot_step as ss
    from mdtpu.ops.cell_grid import CellGridEngine
    from mdtpu.potentials.lennard_jones import LennardJones

    n, rho, temp = 65536, 0.8, 1.0
    state, advance = build(slot=True)
    state = advance(state, 200)
    jax.block_until_ready(state)
    pot = LennardJones(r_cut=2.5, force_shift=True)
    params = Parameters(density=rho, n_particles=n, dt=0.002, potential=pot)
    eng = CellGridEngine.create(pot, 2.5, 0.3, np.asarray(state.unitcell), n,
                                cell_capacity=30)

    step = ss.make_slot_step(params, NVT(temp, 0.4), eng, rebin_check=False)

    adv1 = jax.jit(lambda s, k: jax.lax.fori_loop(0, k, lambda i, x: step(x), s))
    timed(adv1, state, "fori_norebin")

    def body2(i, s):
        s = step(s)
        flag = ss.slot_needs_rebin(s, eng)
        return s.replace(virial_accum=s.virial_accum
                         + flag.astype(s.virial_accum.dtype))
    adv2 = jax.jit(lambda s, k: jax.lax.fori_loop(0, k, body2, s))
    timed(adv2, state, "fori_norebin_plus_needs")

    adv3 = jax.jit(ss.make_slot_advance(params, NVT(temp, 0.4), eng))
    timed(adv3, state, "nested_while_advance")


if __name__ == "__main__":
    import sys
    if "variants2" in sys.argv:
        variants2()
    elif "variants" in sys.argv:
        variants()
    else:
        main()
