"""Evaluation-form polynomial kernels over Fr (JAX/XLA, TPU-first).

Device-tier replacement for the reference's `Polynomial<FE>` usage
(SURVEY.md §2b) re-based on evaluation form: barycentric evaluation and
the KZG quotient polynomial on the bit-reversed roots-of-unity domain
(the spec semantics the reference left unimplemented — see SURVEY.md §5
"missing FFT").

All kernels operate on Montgomery-form Fr limb arrays uint32[16, B]
(limbs-first; see ops/limbs.py) and are exact — validated limb-for-limb
against host/fft.py oracles.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R
from ..host import fft as HFFT
from . import limbs as lb
from .field_ops import FR


def batch_inv(x: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion via a product tree: ~2 log2(B) multiplies plus ONE
    Fermat inversion of a single element (vs. 256 full-width multiplies for
    elementwise Fermat). x: [16, B] Montgomery, B a power of two.

    All inputs must be nonzero (callers mask zeros to 1 beforehand).
    """
    B = x.shape[-1]
    assert B & (B - 1) == 0
    levels = [x]
    cur = x
    while cur.shape[-1] > 1:
        half = cur.shape[-1] // 2
        cur = FR.mul(cur[..., :half], cur[..., half:])
        levels.append(cur)
    inv = FR.inv(cur)  # [16, 1]
    for lvl in range(len(levels) - 2, -1, -1):
        below = levels[lvl]
        half = below.shape[-1] // 2
        left, right = below[..., :half], below[..., half:]
        inv = jnp.concatenate([FR.mul(inv, right), FR.mul(inv, left)], axis=-1)
    return inv


class FrDomain:
    """Precomputed device constants for one evaluation domain size n."""

    def __init__(self, n: int):
        assert n & (n - 1) == 0
        self.n = n
        roots_nat = HFFT.fr_roots_of_unity(n)
        self.roots_brp_ints = HFFT.bit_reversal_permutation(roots_nat)
        self.root_index = {w: i for i, w in enumerate(self.roots_brp_ints)}
        self.roots_brp = jnp.asarray(FR.to_mont_host(self.roots_brp_ints))
        self.n_inv_mont = jnp.asarray(
            FR.to_mont_host([pow(n, R - 2, R)])
        )  # [16, 1]

    # -- kernels (jitted once per domain size) ------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _eval_kernel(self, evals_m, z_m, zn_minus_1_m):
        """Barycentric: y = (z^n - 1)/n * sum_i e_i w_i / (z - w_i).

        evals_m: [..., 16, n] Montgomery; z_m, zn_minus_1_m: [..., 16, 1]
        Montgomery (optional leading batch dims). z must NOT be in the
        domain (host checks first).
        """
        target = z_m.shape[:-1] + (self.n,)
        denoms = FR.sub(jnp.broadcast_to(z_m, target), self.roots_brp)
        inv_denoms = batch_inv(denoms)
        terms = FR.mul(FR.mul(evals_m, self.roots_brp), inv_denoms)
        total = _sum_tree(terms)
        total = FR.mul(total, zn_minus_1_m)
        return FR.mul(total, self.n_inv_mont)

    @functools.partial(jax.jit, static_argnums=0)
    def _quotient_kernel(self, evals_m, y_m, z_m):
        """q_i = (e_i - y) / (w_i - z) on the brp domain (z not in domain).
        Supports leading batch dims ([..., 16, n] evals, [..., 16, 1] y/z).
        Returns PLAIN (non-Montgomery) limbs ready for MSM digit extraction.
        """
        target = z_m.shape[:-1] + (self.n,)
        shifted = FR.sub(evals_m, jnp.broadcast_to(y_m, evals_m.shape))
        denoms = FR.sub(self.roots_brp, jnp.broadcast_to(z_m, target))
        q = FR.mul(shifted, batch_inv(denoms))
        return FR.from_mont(q)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _quotient_in_domain_kernel(self, evals_m, m_onehot, z_inv_m):
        """Quotient when z == w_m (m given as a one-hot bool [n] mask):

          q_i = (e_i - y) / (w_i - z)                      for i != m
          q_m = sum_{i != m} (e_i - y) * w_i / (z * (z - w_i))

        with y = e_m. Returns PLAIN limbs.
        """
        y_m = _masked_pick(evals_m, m_onehot)  # [16, 1]
        z_m = _masked_pick(self.roots_brp, m_onehot)
        shifted = FR.sub(evals_m, jnp.broadcast_to(y_m, evals_m.shape))
        denoms = FR.sub(self.roots_brp, jnp.broadcast_to(z_m, self.roots_brp.shape))
        # mask the zero denominator at i == m to 1 for the inversion tree
        safe = lb.select(m_onehot, jnp.broadcast_to(FR.ONE_limbs, denoms.shape), denoms)
        inv_denoms = lb.select(
            m_onehot, jnp.zeros_like(denoms), batch_inv(safe)
        )  # [16, n]; inv(w_i - z), 0 at i == m
        q = FR.mul(shifted, inv_denoms)
        # q_m: note 1/(z - w_i) = -inv_denoms_i
        terms = FR.mul(FR.mul(shifted, self.roots_brp), FR.neg(inv_denoms))
        acc = FR.mul(_sum_tree(terms), z_inv_m)  # [16, 1]
        q = lb.select(m_onehot, jnp.broadcast_to(acc, q.shape), q)
        return FR.from_mont(q)

    # -- host-facing API ------------------------------------------------------

    def evaluate_blobs_plain(self, plain_limbs, zs) -> list:
        """Batched p_b(z_b) from PLAIN limb arrays [B, 16, n] (the codec's
        zero-copy layout) and host ints zs. One device round-trip for the
        whole batch — the per-blob path pays a tunnel RTT each.

        z-in-domain lanes short-circuit on host (the caller's blob bytes
        are authoritative there)."""
        import numpy as np

        b = plain_limbs.shape[0]
        zs = [z % R for z in zs]
        evals_m = FR.to_mont(jnp.asarray(plain_limbs))  # [B, 16, n]
        z_m = jnp.asarray(
            np.stack([FR.to_mont_host([z]) for z in zs])
        )  # [B, 16, 1]
        zn1 = jnp.asarray(
            np.stack(
                [FR.to_mont_host([(pow(z, self.n, R) - 1) % R]) for z in zs]
            )
        )
        ys = self._eval_kernel(evals_m, z_m, zn1)  # [B, 16, 1]
        out = FR.from_mont_host(
            np.asarray(ys).transpose(1, 0, 2).reshape(16, b)
        )
        # patch in-domain lanes exactly
        for i, z in enumerate(zs):
            idx = self.root_index.get(z)
            if idx is not None:
                out[i] = lb.limbs_to_ints(
                    np.asarray(plain_limbs[i, :, idx : idx + 1])
                )[0]
        return out

    def evaluate(self, evals_ints, z: int) -> int:
        """p(z) from evaluation-form ints; exact (consensus semantics)."""
        z %= R
        idx = self.root_index.get(z)
        if idx is not None:
            return evals_ints[idx] % R
        evals_m = jnp.asarray(FR.to_mont_host(evals_ints))
        z_m = jnp.asarray(FR.to_mont_host([z]))
        zn1 = jnp.asarray(FR.to_mont_host([(pow(z, self.n, R) - 1) % R]))
        y = self._eval_kernel(evals_m, z_m, zn1)
        return FR.from_mont_host(np.asarray(y))[0]

    def quotient_plain_device(self, evals_ints, z: int, y: int):
        """Device PLAIN limb array [16, n] of the quotient evaluations."""
        evals_m = jnp.asarray(FR.to_mont_host(evals_ints))
        return self.quotient_plain_from_mont(evals_m, z, y)

    def quotient_plain_from_mont(self, evals_m, z: int, y) -> jnp.ndarray:
        """Quotient from an already-device Montgomery evals array [16, n].

        y may be an int or an already-device Montgomery [16, 1] array
        (ignored when z is in the domain)."""
        z %= R
        idx = self.root_index.get(z)
        if idx is None:
            z_m = jnp.asarray(FR.to_mont_host([z]))
            y_m = (
                y
                if isinstance(y, jnp.ndarray)
                else jnp.asarray(FR.to_mont_host([int(y)]))
            )
            return self._quotient_kernel(evals_m, y_m, z_m)
        onehot = jnp.asarray(np.arange(self.n) == idx)
        z_inv = jnp.asarray(FR.to_mont_host([pow(z, R - 2, R)]))
        return self._quotient_in_domain_kernel(evals_m, onehot, z_inv)


def _sum_tree(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise-tree sum over the batch axis: [16, B] -> [16, 1]."""
    while x.shape[-1] > 1:
        half = x.shape[-1] // 2
        x = FR.add(x[..., :half], x[..., half:])
    return x


def _masked_pick(x: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Select the single column where onehot is True -> [16, 1]."""
    picked = jnp.where(onehot[None, :], x, 0)
    return jnp.sum(picked, axis=-1, keepdims=True, dtype=jnp.uint32)


_domains = {}


def get_domain(n: int) -> FrDomain:
    if n not in _domains:
        _domains[n] = FrDomain(n)
    return _domains[n]
