"""I/O: Ext-XYZ round-trip, LAMMPS dump format, log-times, zstd, checkpoints
(SURVEY.md section 4 unit tests)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mdtpu.io.checkpoint import load_checkpoint, save_checkpoint
from mdtpu.io.compress import compress_zstd, decompress_zstd
from mdtpu.io.lammps import format_lammps_frame
from mdtpu.io.logtimes import generate_log_times
from mdtpu.io.xyz import read_xyz, write_xyz
from mdtpu.sim.initialization import build_state_from_arrays


def test_xyz_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 5, (17, 3))
    diam = rng.uniform(0.8, 1.2, 17)
    cell = np.diag([5.0, 6.0, 7.0])
    path = str(tmp_path / "conf.xyz")
    write_xyz(path, 42, cell, pos, diam, mode="w")
    cell2, pos2, diam2 = read_xyz(path, 3)
    np.testing.assert_allclose(cell2, cell, atol=1e-12)
    np.testing.assert_allclose(pos2, pos, atol=1e-6)
    np.testing.assert_allclose(diam2, diam, atol=1e-6)


def test_xyz_roundtrip_triclinic_2d(tmp_path):
    pos = np.array([[0.5, 0.5], [1.5, 1.0]])
    diam = np.array([1.0, 1.1])
    cell = np.array([[4.0, 0.7], [0.0, 3.0]])
    path = str(tmp_path / "c2.xyz")
    write_xyz(path, 0, cell, pos, diam, mode="w")
    cell2, pos2, diam2 = read_xyz(path, 2)
    np.testing.assert_allclose(cell2, cell, atol=1e-12)  # column-major parity
    np.testing.assert_allclose(pos2, pos, atol=1e-6)


def test_xyz_header_format(tmp_path):
    # Header must match /root/reference/src/io.jl:42-70
    path = str(tmp_path / "h.xyz")
    write_xyz(path, 3, np.eye(3) * 2.0, np.zeros((1, 3)), np.ones(1), mode="w")
    lines = open(path).read().splitlines()
    assert lines[0] == "1"
    assert lines[1].startswith('Lattice="')
    assert "Properties=type:I:1:id:I:1:radius:R:1:pos:R:3" in lines[1]
    assert "Time=3" in lines[1]
    assert lines[2].startswith("1 1 0.500000 ")


def test_lammps_frame_3d_format():
    # /root/reference/src/io.jl:96-170
    pos = np.array([[0.5, 0.5, 0.5]])
    img = np.array([[1, 0, -1]])
    frame = format_lammps_frame(7, np.diag([2.0, 3.0, 4.0]), pos, img, np.ones(1))
    lines = frame.splitlines()
    assert lines[0] == "ITEM: TIMESTEP" and lines[1] == "7"
    assert lines[2] == "ITEM: NUMBER OF ATOMS" and lines[3] == "1"
    assert lines[4] == "ITEM: BOX BOUNDS xy xz yz pp pp pp"
    assert lines[8] == "ITEM: ATOMS id type radius x y z xu yu zu"
    cols = lines[9].split()
    assert cols[:3] == ["1", "1", "0.500000"]
    # unwrapped = pos + cell @ image
    np.testing.assert_allclose([float(c) for c in cols[6:9]], [2.5, 0.5, -3.5])


def test_lammps_frame_2d_format():
    frame = format_lammps_frame(0, np.diag([2.0, 3.0]), np.zeros((1, 2)),
                                np.zeros((1, 2), int), np.ones(1))
    lines = frame.splitlines()
    assert lines[4] == "ITEM: BOX BOUNDS xy pp pp"
    assert lines[8] == "ITEM: ATOMS id type radius x y xu yu"


def test_log_times(tmp_path):
    # /root/reference/src/io.jl:17-36: sorted, unique, includes 1, 1.35^i floors
    logs = generate_log_times(save_dir=str(tmp_path), max_step=2000)
    assert logs == sorted(set(logs))
    assert 1 in logs
    assert all(t <= 2000 for t in logs)
    assert os.path.isfile(tmp_path / "new-log-times.txt")
    first = open(tmp_path / "new-log-times.txt").readline()
    assert first.startswith("#maxsnap=40,base=1.35")


def test_zstd_roundtrip(tmp_path):
    path = str(tmp_path / "traj.xyz")
    payload = "hello trajectory\n" * 1000
    open(path, "w").write(payload)
    out = compress_zstd(path)
    assert out.endswith(".zst") and os.path.isfile(out)
    assert not os.path.isfile(path)  # original deleted, like the reference
    restored = decompress_zstd(out)
    assert open(restored).read() == payload


def test_checkpoint_roundtrip(tmp_path):
    key = jax.random.PRNGKey(9)
    pos = jax.random.uniform(key, (8, 3), dtype=jnp.float64) * 4.0
    state = build_state_from_arrays(pos, jnp.ones(8), jnp.eye(3) * 4.0, key,
                                    dtype=jnp.float64)
    state = state.replace(step=jnp.asarray(123, jnp.int32),
                          velocities=state.velocities + 0.5)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(state, path)
    template = build_state_from_arrays(jnp.zeros((8, 3)), jnp.ones(8),
                                       jnp.eye(3) * 4.0, jax.random.PRNGKey(0),
                                       dtype=jnp.float64)
    restored = load_checkpoint(path, template)
    np.testing.assert_array_equal(restored.positions, state.positions)
    np.testing.assert_array_equal(restored.velocities, state.velocities)
    assert int(restored.step) == 123
    np.testing.assert_array_equal(
        jax.random.key_data(restored.key), jax.random.key_data(state.key)
    )
    # The key leaf keeps the TEMPLATE's representation: rewrapping a raw
    # uint32 PRNGKey as a typed key<fry> changes the pytree signature and
    # invalidates every program compiled against it (~60 s per recompile on
    # the remote TPU).
    assert restored.key.dtype == template.key.dtype
    assert restored.key.shape == template.key.shape


def test_checkpoint_preserves_typed_key_representation(tmp_path):
    key = jax.random.key(3)   # new-style typed key
    pos = jax.random.uniform(jax.random.PRNGKey(0), (4, 3),
                             dtype=jnp.float64) * 4.0
    state = build_state_from_arrays(pos, jnp.ones(4), jnp.eye(3) * 4.0, key,
                                    dtype=jnp.float64)
    path = str(tmp_path / "ck_typed.npz")
    save_checkpoint(state, path)
    restored = load_checkpoint(path, state)
    assert restored.key.dtype == state.key.dtype
    assert restored.key.shape == state.key.shape
    np.testing.assert_array_equal(jax.random.key_data(restored.key),
                                  jax.random.key_data(state.key))


def test_native_writer_byte_parity_adversarial(tmp_path):
    """The C++ async writer's fast fixed-6 formatter must be byte-identical
    to the Python "%.6f" formatter (= printf, correctly rounded) — including
    the ambiguous-rounding band where it falls back to snprintf, signed
    zeros, and large magnitudes (native/trajwriter.cc fmt_f6)."""
    import pytest

    from mdtpu.io.native_writer import (NativeTrajectoryWriter,
                                        native_available)

    if not native_available():
        pytest.skip("native writer unavailable (no toolchain)")

    rng = np.random.default_rng(3)
    n = 4096
    pos = rng.uniform(-60.0, 60.0, (n, 3))
    # Adversarial rows: exact/near rounding-tie values (k + 1/2) * 1e-6
    # (the snprintf-fallback band), band-edge values, signed zeros, tiny
    # negatives (printf prints "-0.000000"), and large magnitudes.
    ties = (rng.integers(0, 10_000_000, 256).astype(np.float64) + 0.5) * 1e-6
    edge = ties + rng.choice([-1.2e-3, 1.2e-3], 256) * 1e-6
    special = np.array([0.0, -0.0, 1e-9, -1e-9, 0.9999995, -0.9999995,
                        1.0000005, 2.5e-7, -2.5e-7, 123456.7890005,
                        4.2e6, -4.2e6, 5.0e12, 0.5e-6, -0.5e-6, 1.5e-6])
    adv = np.concatenate([ties, edge, np.tile(special, 33)])[: 3 * (n // 4)]
    pos.reshape(-1)[: adv.size] = adv
    img = rng.integers(-700, 700, (n, 3)).astype(np.int32)
    diam = rng.uniform(0.5, 2.5, n)
    cell = np.array([[31.7, 1.3, 0.0], [0.0, 29.9, 2.1], [0.0, 0.0, 28.4]])

    path = str(tmp_path / "native.lammps")
    w = NativeTrajectoryWriter(path)
    w.write_frame(12345, cell, pos, img, diam)
    w.close()
    with open(path) as f:
        got = f.read()
    want = format_lammps_frame(12345, cell, pos, img, diam)
    assert got == want

    # 2D layout too (separate row format).
    path2 = str(tmp_path / "native2d.lammps")
    w = NativeTrajectoryWriter(path2)
    w.write_frame(7, cell[:2, :2], pos[:512, :2], img[:512, :2], diam[:512])
    w.close()
    with open(path2) as f:
        got2 = f.read()
    assert got2 == format_lammps_frame(7, cell[:2, :2], pos[:512, :2],
                                       img[:512, :2], diam[:512])
