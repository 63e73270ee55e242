"""Particle state container + HDF5 I/O.

Format-compatible with the reference ParticleContext storage
(ParticleContextLoad/Save, Particle.c:60-118): datasets
`<group>/coord`, `<group>/vel`, `<group>/acc`, each flat (3*P).
The reference hard-codes mass=1.0 and radius=0.1 (Particle.c:22-25);
here they are per-particle arrays with those defaults.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class ParticleState:
    """SoA particle state; all arrays (P, 3) or (P,)."""

    x: jnp.ndarray  # positions
    v: jnp.ndarray  # velocities
    a: jnp.ndarray  # accelerations (stored for I/O parity; recomputed)
    mass: jnp.ndarray  # (P,)
    radius: jnp.ndarray  # (P,)

    @property
    def num_particle(self) -> int:
        return int(self.x.shape[0])


def particle_state(
    x: np.ndarray,
    v: np.ndarray | None = None,
    mass: float | np.ndarray = 1.0,
    radius: float | np.ndarray = 0.1,
    dtype=None,
) -> ParticleState:
    """Create a state; defaults mirror Particle.c:22-25."""
    x = np.asarray(x, dtype=float)
    p = x.shape[0]
    if v is None:
        v = np.zeros_like(x)
    mass = np.broadcast_to(np.asarray(mass, dtype=float), (p,))
    radius = np.broadcast_to(np.asarray(radius, dtype=float), (p,))
    conv = lambda a: jnp.asarray(a, dtype=dtype)
    return ParticleState(
        x=conv(x),
        v=conv(v),
        a=conv(np.zeros_like(x)),
        mass=conv(mass),
        radius=conv(radius),
    )


def save_particles(path: str, group: str, state: ParticleState) -> None:
    """Write <group>/coord|vel|acc flat (3P,), as Particle.c:87-118."""
    import h5py

    with h5py.File(path, "a") as f:
        g = f.require_group(group)
        for name, arr in (("coord", state.x), ("vel", state.v), ("acc", state.a)):
            if name in g:
                del g[name]
            g.create_dataset(name, data=np.asarray(arr).reshape(-1))
        for name, arr in (("mass", state.mass), ("radius", state.radius)):
            if name in g:
                del g[name]
            g.create_dataset(name, data=np.asarray(arr))


def load_particles(path: str, group: str, dtype=None) -> ParticleState:
    """Read the reference layout; mass/radius datasets are optional
    (the reference stores neither - Particle.c:22-25 hard-codes them)."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f[group]
        x = np.asarray(g["coord"]).reshape(-1, 3)
        v = np.asarray(g["vel"]).reshape(-1, 3)
        a = np.asarray(g["acc"]).reshape(-1, 3)
        p = x.shape[0]
        mass = np.asarray(g["mass"]) if "mass" in g else np.ones(p)
        radius = np.asarray(g["radius"]) if "radius" in g else np.full(p, 0.1)
    st = particle_state(x, v, mass=mass, radius=radius, dtype=dtype)
    return ParticleState(
        x=st.x, v=st.v, a=jnp.asarray(a, dtype=st.x.dtype), mass=st.mass,
        radius=st.radius,
    )
