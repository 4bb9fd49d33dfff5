"""Inexact Proximal-point Optimal Transport (IPOT) for graph alignment.

Semantics follow the reference (`/root/reference/src/clip-event/model_ot.py`,
itself from UNITER): batched cosine cost between text-entity and image-object
embeddings, a fixed-iteration IPOT solver whose transport plan is a
stop-gradient, and distance = trace(Cᵀ·T). The 50×k masked iteration loop is
a `lax.scan` here (single fused XLA loop) and a fused Pallas TPU kernel in
`ops.ot_pallas`.

One deliberate robustness extension over the reference: `safe=True` clamps
node counts to ≥1 and zeroes the distance of instances with no real nodes —
the reference NaNs on empty graphs (`model_ot.py:36-37` divides by zero).
Parity tests run with `safe=False`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MASK_BIG = 1e4  # reference model_ot.py:52-53


def cost_matrix_cosine(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Pairwise cosine distance: [B, M, D] × [B, N, D] → [B, M, N].

    Normalization matches `F.normalize(p=2, eps=1e-5)`: denominator is
    max(norm, eps), not norm+eps.
    """
    def norm(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, eps)

    sim = jnp.einsum("bmd,bnd->bmn", norm(x), norm(y), preferred_element_type=jnp.float32)
    return 1.0 - sim


def ipot(
    C: jnp.ndarray,
    x_len: jnp.ndarray,
    x_pad: jnp.ndarray,
    y_len: jnp.ndarray,
    y_pad: jnp.ndarray,
    joint_pad: jnp.ndarray,
    beta: float,
    iterations: int,
    k: int,
) -> jnp.ndarray:
    """IPOT transport plan. C: [B, M, N]; returns T: [B, N, M] (transposed,
    as in the reference). All arithmetic float32; no gradients flow (wrap the
    call in stop_gradient — done by `optimal_transport_dist`).
    """
    B, M, N = C.shape
    C = C.astype(jnp.float32)
    x_len = x_len.astype(jnp.float32)
    y_len = y_len.astype(jnp.float32)

    joint_pad_T = jnp.swapaxes(joint_pad, 1, 2)  # [B, N, M]
    A = jnp.where(joint_pad_T, 0.0, jnp.exp(-jnp.swapaxes(C, 1, 2) / beta))
    T0 = jnp.where(joint_pad_T, 0.0, jnp.ones((B, N, M), jnp.float32))
    sigma0 = jnp.where(x_pad, 0.0, 1.0 / x_len[:, None])  # [B, M]

    x_mask = jnp.where(x_pad, MASK_BIG, 0.0)[:, None, :]  # [B, 1, M]
    y_mask = jnp.where(y_pad, MASK_BIG, 0.0)[:, None, :]  # [B, 1, N]
    x_len_b = x_len[:, None, None]
    y_len_b = y_len[:, None, None]

    def outer(carry, _):
        T, sigma = carry
        Q = A * T  # [B, N, M]

        def inner(sig, _):
            # delta: [B, 1, N]; sig: [B, M]
            q_sig = jnp.einsum("bnm,bm->bn", Q, sig, preferred_element_type=jnp.float32)
            delta = 1.0 / (y_len_b * q_sig[:, None, :] + y_mask)
            d_q = jnp.einsum("bon,bnm->bom", delta, Q, preferred_element_type=jnp.float32)
            sig_new = 1.0 / (x_len_b * d_q + x_mask)
            return sig_new[:, 0, :], delta

        sigma, deltas = jax.lax.scan(inner, sigma, None, length=k)
        delta = deltas[-1]  # [B, 1, N]
        T = delta[:, 0, :, None] * Q * sigma[:, None, :]
        return (T, sigma), None

    (T, _), _ = jax.lax.scan(outer, (T0, sigma0), None, length=iterations)
    return jnp.where(joint_pad_T, 0.0, T)


def optimal_transport_dist(
    txt_emb: jnp.ndarray,
    img_emb: jnp.ndarray,
    txt_pad: jnp.ndarray,
    img_pad: jnp.ndarray,
    beta: float = 0.5,
    iterations: int = 50,
    k: int = 1,
    safe: bool = False,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Batched OT distance (reference `model_ot.py:66-84`).

    txt_emb [B, M, D], img_emb [B, N, D]; pads True at padded nodes.
    Returns [B] float32. Gradients flow through the cost only (the plan is a
    constant, reference `@torch.no_grad` + `.detach()`).
    """
    txt_pad = txt_pad.astype(bool)
    img_pad = img_pad.astype(bool)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]

    cost = cost_matrix_cosine(txt_emb.astype(jnp.float32), img_emb.astype(jnp.float32))
    cost = jnp.where(joint_pad, 0.0, cost)

    txt_len = (txt_pad.shape[1] - txt_pad.sum(axis=1)).astype(jnp.float32)
    img_len = (img_pad.shape[1] - img_pad.sum(axis=1)).astype(jnp.float32)
    if safe:
        txt_len = jnp.maximum(txt_len, 1.0)
        img_len = jnp.maximum(img_len, 1.0)

    if use_pallas:
        from clip_event_tpu.ops.ot_pallas import ipot_pallas

        T = ipot_pallas(
            jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
            beta=beta, iterations=iterations, k=k,
        )
    else:
        T = ipot(
            jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
            joint_pad, beta, iterations, k,
        )
    T = jax.lax.stop_gradient(T)

    # trace(C @ T): with C [B, M, N] and T [B, N, M] → Σ_mn C[m,n]·T[n,m]
    distance = jnp.einsum("bmn,bnm->b", cost, T, preferred_element_type=jnp.float32)
    if safe:
        has_nodes = (~txt_pad).any(axis=1) & (~img_pad).any(axis=1)
        distance = jnp.where(has_nodes, distance, 0.0)
    return distance


@functools.partial(jax.jit, static_argnames=("scale", "safe", "use_pallas"))
def alignment_loss(
    entity_emb: jnp.ndarray,
    object_emb: jnp.ndarray,
    entity_mask: jnp.ndarray,
    object_mask: jnp.ndarray,
    scale: float = 0.01,
    safe: bool = True,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """`CriterionAlignment` (reference `model_clip.py:664-715`).

    entity_emb [B, M, E]; object_emb [B, N, E] where slot 0 is the whole
    image (dropped, reference `model_clip.py:686`); masks are 1 at real
    nodes. Returns scalar `0.01 · Σ_b ot_dist_b`.

    use_pallas: True/False, or "auto" — the fused kernel wins only once the
    (static) node axes reach ~32 (measured, PERFORMANCE.md "IPOT kernel");
    below that the batched XLA scan is faster.
    """
    img_nodes = object_emb[:, 1:]
    if use_pallas == "auto":
        use_pallas = min(entity_emb.shape[1], img_nodes.shape[1]) >= 32
    txt_pad = entity_mask == 0
    img_pad = object_mask[:, 1:] == 0
    dist = optimal_transport_dist(
        entity_emb.astype(jnp.float32),
        img_nodes.astype(jnp.float32),
        txt_pad,
        img_pad,
        safe=safe,
        use_pallas=use_pallas,
    )
    return scale * dist.sum()
