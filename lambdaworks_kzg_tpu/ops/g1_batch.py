"""Batched G1 utilities on device: scalar muls, decompression, subgroup
checks, and the G1 group-FFT.

TPU-native replacements for the reference's per-point host loops:
  * subgroup check = full scalar-mul by r per point
    (reference src/compression.rs:22-27) -> one batched double-and-add
    over all lanes;
  * G1 decompression sqrt (reference src/compression.rs:62-103) ->
    batched Fp exponentiation by (p+1)/4;
  * the monomial->Lagrange setup conversion (the fft_g1 the reference
    left commented out, src/lib.rs:760-770) -> batched butterfly stages
    with per-lane twiddle scalar muls.

All compute dispatches through ops/dispatch.py (fused Mosaic kernels on
TPU). Exact: validated against the host oracles in tests/test_g1_batch.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import P, R
from ..host import curve as HC
from ..host import fft as HFFT
from ..constants import fr_root_of_unity
from . import dispatch as D
from . import g1_ops as g1
from . import limbs as lb
from .field_ops import FP

L = FP.L


def lift_affine(points_aff: jnp.ndarray, valid) -> jnp.ndarray:
    """[2, L, B] affine Montgomery + valid mask -> [3, L, B] Jacobian."""
    b = points_aff.shape[-1]
    one = jnp.broadcast_to(FP.ONE_limbs, (L, b)).astype(jnp.uint32)
    z = jnp.where(jnp.asarray(valid)[None, :], one, 0)
    return jnp.stack([points_aff[0], points_aff[1], z], axis=0)


@functools.partial(jax.jit, static_argnames=("k",))
def scalar_mul_fixed(points_jac: jnp.ndarray, k: int) -> jnp.ndarray:
    """[k]P for a host-known scalar, batched: [3, L, B] -> [3, L, B].

    Left-to-right double-and-add over k's bits (fori_loop; the bit table
    is a device constant)."""
    nbits = max(k.bit_length(), 1)
    bits = jnp.asarray([(k >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)

    def body(i, carry):
        acc, base = carry
        added = D.add(acc, base)
        take = jnp.broadcast_to(bits[i].astype(bool), acc.shape[-1:])
        acc = jnp.where(take[None, None, :], added, acc)
        base = D.dbl(base)
        return (acc, base)

    acc0 = jnp.zeros_like(points_jac)
    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, points_jac))
    return acc


@jax.jit
def scalar_mul_per_lane(
    points_jac: jnp.ndarray, scalars_plain: jnp.ndarray
) -> jnp.ndarray:
    """[k_b]P_b with per-lane 256-bit scalars: scalars uint32[16, B] plain."""

    def body(i, carry):
        acc, base = carry
        limb = jax.lax.dynamic_index_in_dim(
            scalars_plain, i // 16, axis=0, keepdims=False
        )  # [B]
        bit = (limb >> (i % 16).astype(jnp.uint32)) & 1
        added = D.add(acc, base)
        acc = jnp.where((bit > 0)[None, None, :], added, acc)
        base = D.dbl(base)
        return (acc, base)

    acc0 = jnp.zeros_like(points_jac)
    acc, _ = jax.lax.fori_loop(0, 256, body, (acc0, points_jac))
    return acc


def subgroup_mask_definitional(points_jac: jnp.ndarray) -> jnp.ndarray:
    """bool[B]: [r]P == infinity (definitional subgroup test, batched).

    Same criterion as the reference's check_point_is_in_subgroup
    (src/compression.rs:22-27), vectorized over all lanes. Kept as the
    oracle the fast endomorphism check is differential-tested against."""
    return g1.is_infinity(scalar_mul_fixed(points_jac, R))


_BETA_MONT = None  # NUMPY (a cached jnp array created inside a trace
# leaks that trace's tracer into later traces — keep host constants np)


def _beta_mont():
    global _BETA_MONT
    if _BETA_MONT is None:
        from ..constants import G1_BETA

        _BETA_MONT = FP.to_mont_host([G1_BETA])
    return _BETA_MONT


@jax.jit
def _jacobian_eq_mask(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """bool[B]: p == q as curve points (cross-multiplied Jacobian test)."""
    X1, Y1, Z1 = p[0], p[1], p[2]
    X2, Y2, Z2 = q[0], q[1], q[2]
    Z11, Z22 = FP.sqr(Z1), FP.sqr(Z2)
    ex = FP.eq(FP.mul(X1, Z22), FP.mul(X2, Z11))
    ey = FP.eq(
        FP.mul(FP.mul(Y1, Z2), Z22), FP.mul(FP.mul(Y2, Z1), Z11)
    )
    inf1, inf2 = FP.is_zero(Z1), FP.is_zero(Z2)
    either = inf1 | inf2
    return jnp.where(either, inf1 == inf2, ex & ey)


@jax.jit
def subgroup_mask(points_jac: jnp.ndarray) -> jnp.ndarray:
    """bool[B]: P in G1, batched fast endomorphism check (Scott):
    sigma(P) == -[x^2]P with sigma = (BETA*X, Y, Z) acting as -x^2.

    Two 64-bit fixed-scalar muls (~128 lockstep point ops) instead of the
    definitional 255-bit [r]P (~380) — see host/curve._g1_in_subgroup_fast
    for the eigenvalue-pairing proof obligations. Infinity lanes pass (all
    three coordinate planes zero on both sides). Differential-tested
    against subgroup_mask_definitional in tests/test_g1_batch.py."""
    from ..constants import BLS_X

    x_abs = -BLS_X
    xP = scalar_mul_fixed(points_jac, x_abs)
    xxP = scalar_mul_fixed(xP, x_abs)
    beta = jnp.broadcast_to(_beta_mont(), points_jac.shape[-2:])
    sigma = jnp.stack(
        [FP.mul(points_jac[0], beta), points_jac[1], points_jac[2]], axis=0
    )
    neg_xxP = jnp.stack([xxP[0], FP.neg(xxP[1]), xxP[2]], axis=0)
    return _jacobian_eq_mask(sigma, neg_xxP)


# -- batched decompression ----------------------------------------------------

_P_MINUS_1_HALF = (P - 1) // 2
_HALF_LIMBS = jnp.asarray(lb.int_to_limbs(_P_MINUS_1_HALF, 24))
_B_MONT = jnp.asarray(FP.to_mont_host([4]))  # curve b = 4


@jax.jit
def _xy_from_x(x_mont: jnp.ndarray):
    """y = sqrt(x^3 + 4) with p = 3 mod 4: y0 = (x^3+4)^((p+1)/4).

    Returns (y0 Montgomery [24, B], qr bool [B]: square existed)."""
    rhs = FP.add(
        FP.mul(FP.sqr(x_mont), x_mont), jnp.broadcast_to(_B_MONT, x_mont.shape)
    )
    y0 = FP.pow_fixed(rhs, (P + 1) // 4)
    qr = FP.eq(FP.sqr(y0), rhs)
    return y0, qr


@jax.jit
def _pick_sign(y0_mont: jnp.ndarray, want_largest: jnp.ndarray):
    """Select y or p-y so that `lexicographically largest` matches the
    compressed sign bit (reference src/compression.rs:51-54)."""
    y_plain = FP.from_mont(y0_mont)
    is_largest = lb.compare_ge(y_plain, _HALF_LIMBS) & ~FP.is_zero(y_plain)
    # y > (p-1)/2  <=>  y >= (p-1)/2 + 1; compare_ge(y, half) gives
    # y >= (p-1)/2, equality only when y == half (not largest). Fix:
    eq_half = jnp.all(y_plain == _HALF_LIMBS, axis=-2)
    is_largest = is_largest & ~eq_half
    flip = is_largest != want_largest
    return jnp.where(flip[None, :], FP.neg(y0_mont), y0_mont)


def decompress_batch(compressed: "list[bytes]", subgroup_check: bool = True):
    """Batched G1 decompression of n 48-byte strings.

    Returns (points_aff uint32[2, L, n] Montgomery, infinity bool[n],
    error bool[n]). Bit layout parity: reference src/compression.rs:62-103
    (3 control bits; sign = lexicographically-larger y) plus the subgroup
    check the spec requires.
    """
    n = len(compressed)
    arr = np.frombuffer(b"".join(compressed), dtype=np.uint8).reshape(n, 48)
    c_bit = (arr[:, 0] >> 7) & 1
    i_bit = (arr[:, 0] >> 6) & 1
    s_bit = (arr[:, 0] >> 5) & 1

    # parse x as big-endian 381-bit ints with the 3 control bits masked
    masked = arr.copy()
    masked[:, 0] &= 0x1F
    x_ints = [int.from_bytes(masked[i].tobytes(), "big") for i in range(n)]

    error = (c_bit == 0)  # uncompressed form unsupported (as in reference)
    is_inf = (i_bit == 1) & ~error
    # infinity must be exactly 0xc0 00...00
    canonical_inf = is_inf & (s_bit == 0) & np.asarray(
        [v == 0 for v in x_ints]
    )
    error |= is_inf & ~canonical_inf
    x_oob = np.asarray([v >= P for v in x_ints])
    error |= x_oob & ~is_inf

    x_mont = jnp.asarray(
        FP.to_mont_host([v % P for v in x_ints])
    )  # junk on error lanes
    y0, qr = _xy_from_x(x_mont)
    y = _pick_sign(y0, jnp.asarray(s_bit == 1))

    error |= np.asarray(~qr) & ~is_inf  # x not on curve
    valid = ~error & ~is_inf

    points_aff = jnp.stack([x_mont, y], axis=0)
    if subgroup_check:
        jac = lift_affine(points_aff, jnp.asarray(valid))
        in_sub = np.asarray(subgroup_mask(jac))
        error |= ~in_sub & valid
        valid &= in_sub
    # zero out non-valid lanes so downstream sees clean infinity rows
    keep = jnp.asarray(valid)[None, None, :]
    points_aff = jnp.where(keep, points_aff, 0)
    return points_aff, jnp.asarray(is_inf & ~error), np.asarray(error)


# -- G1 group-FFT on device ---------------------------------------------------


def _neg_y(p_jac: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [p_jac[0:1], FP.neg(p_jac[1])[None], p_jac[2:3]], axis=0
    )


def g1_fft_device(points_jac: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Radix-2 FFT over G1, batched butterflies: [3, L, n] -> [3, L, n].

    Natural order in/out (matches host/fft.g1_fft). Twiddle application
    is a per-lane variable scalar mul (256-bit double-and-add, all lanes
    in lockstep); butterflies are batched point adds.
    """
    n = points_jac.shape[-1]
    assert n & (n - 1) == 0
    brp = jnp.asarray(
        np.asarray(HFFT.bit_reversal_permutation(list(range(n)))),
        dtype=jnp.int32,
    )
    a = jnp.take(points_jac, brp, axis=-1)

    length = 2
    while length <= n:
        half = length // 2
        w = fr_root_of_unity(length)
        if inverse:
            w = pow(w, R - 2, R)
        tw = [1] * half
        for j in range(1, half):
            tw[j] = tw[j - 1] * w % R
        tw_plane = jnp.asarray(lb.ints_to_limbs(tw * (n // length), 16))

        a4 = a.reshape(3, L, n // length, length)
        even = a4[..., :half].reshape(3, L, n // 2)
        odd = a4[..., half:].reshape(3, L, n // 2)
        t = scalar_mul_per_lane(odd, tw_plane)
        out_e = D.add(even, t).reshape(3, L, n // length, half)
        out_o = D.add(even, _neg_y(t)).reshape(3, L, n // length, half)
        a = jnp.concatenate([out_e, out_o], axis=-1).reshape(3, L, n)
        length *= 2

    if inverse:
        n_inv = pow(n, R - 2, R)
        a = scalar_mul_fixed(a, n_inv)
    return a


def jacobians_to_host_affine(points_jac: jnp.ndarray):
    """Device Jacobian [3, L, n] -> list of host affine tuples (or None)."""
    host_jacs = g1.points_to_host(points_jac)
    return [HC.to_affine(HC.FP_OPS, pt) for pt in host_jacs]
