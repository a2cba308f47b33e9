"""Material model: probabilistic-lobe single struct, SoA on device.

Reference: struct Material (Source/Main.cpp:51-92) -- albedo, specular in
[0,1], refractivity in [0,1], Beer's-law absorption RGB, ior, emissive x
intensity with an is_light flag.  Lobe selection semantics live in the
integrators; diffuse weight = max(0, 1 - specular - refractivity)
(Source/Main.cpp:436).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Material:
    albedo: tuple[float, float, float] = (0.0, 0.0, 0.0)
    specular: float = 0.0
    refractivity: float = 0.0
    absorption: tuple[float, float, float] = (0.0, 0.0, 0.0)
    ior: float = 1.0
    emissive: tuple[float, float, float] = (0.0, 0.0, 0.0)
    intensity: float = 0.0
    is_light: bool = False

    @classmethod
    def diffuse(cls, albedo, specular: float = 0.0) -> "Material":
        """Material(albedo, spec) ctor (Source/Main.cpp:64-65)."""
        return cls(albedo=tuple(albedo), specular=specular)

    @classmethod
    def dielectric(cls, albedo, specular, refractivity, absorption, ior) -> "Material":
        """Material(albedo, spec, refract, absorption, ior) ctor
        (Source/Main.cpp:66-67)."""
        return cls(
            albedo=tuple(albedo),
            specular=specular,
            refractivity=refractivity,
            absorption=tuple(absorption),
            ior=ior,
        )

    @classmethod
    def light(cls, emissive, intensity) -> "Material":
        """Material(emissive, intensity, light) ctor (Source/Main.cpp:68-69)."""
        return cls(emissive=tuple(emissive), intensity=intensity, is_light=True)

    def replace(self, **kwargs) -> "Material":
        return dataclasses.replace(self, **kwargs)


class MaterialTable(NamedTuple):
    """Device SoA over K materials; lanes gather by material index."""

    albedo: jnp.ndarray        # (K, 3)
    specular: jnp.ndarray      # (K,)
    refractivity: jnp.ndarray  # (K,)
    absorption: jnp.ndarray    # (K, 3)
    ior: jnp.ndarray           # (K,)
    emissive: jnp.ndarray      # (K, 3)  pre-multiplied? no: raw, x intensity
    intensity: jnp.ndarray     # (K,)
    is_light: jnp.ndarray      # (K,) bool


def to_device(materials: list[Material]) -> MaterialTable:
    f32 = np.float32
    return MaterialTable(
        albedo=jnp.asarray(np.array([m.albedo for m in materials], f32)),
        specular=jnp.asarray(np.array([m.specular for m in materials], f32)),
        refractivity=jnp.asarray(np.array([m.refractivity for m in materials], f32)),
        absorption=jnp.asarray(np.array([m.absorption for m in materials], f32)),
        ior=jnp.asarray(np.array([m.ior for m in materials], f32)),
        emissive=jnp.asarray(np.array([m.emissive for m in materials], f32)),
        intensity=jnp.asarray(np.array([m.intensity for m in materials], f32)),
        is_light=jnp.asarray(np.array([m.is_light for m in materials], bool)),
    )
