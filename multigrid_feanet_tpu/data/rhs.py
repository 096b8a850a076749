"""Random right-hand-side field generators (six families) + GRF sampler.

JAX re-implementations of the reference's RHS families (reference:
Data/RHS/generate_rhs.py:6-56) and spectral Gaussian random field
(reference: Data/RHS/gaussian_random_fields.py:47-92), vectorized and keyed
by `jax.random` PRNG keys instead of global numpy state.  The math of each
family is preserved; randomness is reproducible by key.

Families (equal shares in :func:`make_dataset`, as in the reference's
``main``):
  1. uniform-random field with random affine coefs  (coef0*U + coef1)
  2. sparse random points (N/2 nonzeros, random magnitude)
  3. Gaussian random field, spectral 1/|k|^(alpha/2), alpha ~ U(2, 5)
  4. random trigonometric  c0*sin(c1*pi*x)*sin(c2*pi*y)
  5. random polynomial     c0*x^2 + c1*y^2 + c2*x*y + c3
  6. discontinuous: trig / poly split by a random line a*x + b > y
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _xy(n: int):
    c = jnp.linspace(-1.0, 1.0, n)
    return jnp.meshgrid(c, c, indexing="xy")


def random_field(key, n: int) -> jax.Array:
    k1, k2 = jax.random.split(key)
    coef = 10.0 * jax.random.uniform(k1, (2,)) - 5.0
    return coef[0] * jax.random.uniform(k2, (n, n)) + coef[1]


def sparse_points(key, n: int) -> jax.Array:
    """~n/2 random nonzero points with magnitudes (10 U - 5) * U."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    num = n // 2
    ii = jax.random.randint(k1, (num,), 0, n)
    jj = jax.random.randint(k2, (num,), 0, n)
    mags = (10.0 * jax.random.uniform(k3, (num,)) - 5.0) * jax.random.uniform(k4, (num,))
    return jnp.zeros((n, n)).at[ii, jj].set(mags)


def gaussian_random_field(key, n: int, alpha: float | jax.Array = 3.0,
                          normalize: bool = True) -> jax.Array:
    """Spectral GRF with power-law amplitude 1/|k|^(alpha/2)."""
    kf = jnp.fft.fftfreq(n) * n  # integer momentum indices, fft order
    kx, ky = jnp.meshgrid(kf, kf, indexing="ij")
    amplitude = jnp.power(kx**2 + ky**2 + 1e-10, -jnp.asarray(alpha) / 4.0)
    amplitude = amplitude.at[0, 0].set(0.0)
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (n, n)) + 1j * jax.random.normal(k2, (n, n))
    field = jnp.fft.ifft2(noise * amplitude).real
    if normalize:
        field = field - jnp.mean(field)
        field = field / jnp.std(field)
    return field


def gaussian_random_field_random_alpha(key, n: int) -> jax.Array:
    k1, k2 = jax.random.split(key)
    alpha = jax.random.uniform(k1, (), minval=2.0, maxval=5.0)
    return gaussian_random_field(k2, n, alpha)


def trigonometric(key, n: int) -> jax.Array:
    xx, yy = _xy(n)
    coef = 10.0 * jax.random.uniform(key, (3,)) - 5.0
    return coef[0] * jnp.sin(coef[1] * jnp.pi * xx) * jnp.sin(coef[2] * jnp.pi * yy)


def polynomial(key, n: int) -> jax.Array:
    xx, yy = _xy(n)
    coef = 10.0 * jax.random.uniform(key, (4,)) - 5.0
    return coef[0] * xx**2 + coef[1] * yy**2 + coef[2] * xx * yy + coef[3]


def discontinuous(key, n: int) -> jax.Array:
    """Trig field on one side of a random line, poly field on the other."""
    xx, yy = _xy(n)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = 20.0 * jax.random.uniform(k1) - 10.0
    b = 2.0 * jax.random.uniform(k2) - 1.0
    c1 = 10.0 * jax.random.uniform(k3, (3,)) - 5.0
    c2 = 10.0 * jax.random.uniform(k4, (3,)) - 5.0
    trig = c1[0] * jnp.sin(c1[1] * jnp.pi * xx) * jnp.sin(c1[2] * jnp.pi * yy)
    poly = c2[0] * xx**2 + c2[1] * yy**2 + c2[2] * xx * yy
    return jnp.where(a * xx + b > yy, trig, poly)


FAMILIES = (
    random_field,
    sparse_points,
    gaussian_random_field_random_alpha,
    trigonometric,
    polynomial,
    discontinuous,
)


@functools.partial(jax.jit, static_argnames=("n", "count"))
def make_dataset(key, n: int, count: int) -> jax.Array:
    """(count, n, n) RHS fields in equal family shares (family-major order,
    like the reference's h5 layout)."""
    per = count // len(FAMILIES)
    rem = count - per * (len(FAMILIES) - 1)
    chunks = []
    for fi, fam in enumerate(FAMILIES):
        m = rem if fi == len(FAMILIES) - 1 else per
        keys = jax.random.split(jax.random.fold_in(key, fi), m)
        chunks.append(jax.vmap(lambda k: fam(k, n))(keys))
    return jnp.concatenate(chunks, axis=0)
