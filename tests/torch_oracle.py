"""Pure-torch replica of the reference forward pipeline, used as the oracle
for full-model numeric-parity tests.

This module independently re-states the reference semantics (cited per
function into /root/reference/models/point_mamba.py) so that a composed
Group -> Encoder -> graph -> eigh -> SAST -> MixerModel -> head forward can
be compared end-to-end against the JAX implementation with shared weights.
It is test-only code: clarity over speed (sequential scans, per-sample eigh
loops — exactly like the reference).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(sd, key):
    v = sd[key]
    # pass tensors through unconverted so an sd of requires_grad Parameters
    # makes the whole oracle differentiable (full train-step parity test)
    return v if isinstance(v, torch.Tensor) else torch.from_numpy(np.asarray(v))


# Train-mode BatchNorm switch for the train-step parity test: when True,
# F.batch_norm normalizes by batch statistics and updates the running stats
# in-place with torch momentum 0.1 (the reference's nn.BatchNorm1d default).
BN_TRAINING = False


# ---------------------------------------------------------------------------
# Grouping (reference Group.forward, models/point_mamba.py:76-111: pytorch3d
# sample_farthest_points(random_start_point=False) + knn_points)
# ---------------------------------------------------------------------------

def fps_torch(points: torch.Tensor, n_samples: int) -> torch.Tensor:
    """Deterministic FPS from index 0. points (B, N, 3) -> long (B, n)."""
    B, N, _ = points.shape
    idxs = torch.zeros(B, n_samples, dtype=torch.long)
    min_d = torch.full((B, N), float("inf"))
    for i in range(1, n_samples):
        last = points.gather(1, idxs[:, i - 1][:, None, None].expand(-1, 1, 3))
        d = ((points - last) ** 2).sum(-1)
        min_d = torch.minimum(min_d, d)
        idxs[:, i] = min_d.argmax(-1)
    return idxs


def knn_torch(query: torch.Tensor, points: torch.Tensor, k: int) -> torch.Tensor:
    """(B, Q, 3) x (B, N, 3) -> long (B, Q, k) ascending by distance."""
    d = ((query[:, :, None, :] - points[:, None, :, :]) ** 2).sum(-1)
    return d.topk(k, largest=False, dim=-1).indices


def group_torch(pts: torch.Tensor, num_group: int, group_size: int):
    """-> (neighborhood (B,G,M,3) center-normalized, center (B,G,3))."""
    center = pts.gather(1, fps_torch(pts, num_group)[..., None].expand(-1, -1, 3))
    idx = knn_torch(center, pts, group_size)
    B, G, M = idx.shape
    neigh = pts.gather(1, idx.reshape(B, G * M)[..., None].expand(-1, -1, 3))
    neigh = neigh.reshape(B, G, M, 3) - center[:, :, None, :]
    return neigh, center


# ---------------------------------------------------------------------------
# Encoder / pos embed / head (reference models/point_mamba.py:42-73, 459-463,
# 488-498) — eval-mode BatchNorm with running stats
# ---------------------------------------------------------------------------

def _bn_eval(x, sd, stem):
    return F.batch_norm(x, t(sd, f"{stem}.running_mean"), t(sd, f"{stem}.running_var"),
                        t(sd, f"{stem}.weight"), t(sd, f"{stem}.bias"),
                        training=BN_TRAINING, momentum=0.1, eps=1e-5)


def encoder_torch(sd: dict, groups: torch.Tensor, prefix: str = "encoder") -> torch.Tensor:
    """(B, G, M, 3) -> (B, G, C)."""
    B, G, M, _ = groups.shape
    x = groups.reshape(B * G, M, 3).transpose(1, 2)  # (BG, 3, M)
    h = F.conv1d(x, t(sd, f"{prefix}.first_conv.0.weight"), t(sd, f"{prefix}.first_conv.0.bias"))
    h = F.relu(_bn_eval(h, sd, f"{prefix}.first_conv.1"))
    h = F.conv1d(h, t(sd, f"{prefix}.first_conv.3.weight"), t(sd, f"{prefix}.first_conv.3.bias"))
    g = h.max(dim=2, keepdim=True).values
    h = torch.cat([g.expand(-1, -1, M), h], dim=1)
    h = F.conv1d(h, t(sd, f"{prefix}.second_conv.0.weight"), t(sd, f"{prefix}.second_conv.0.bias"))
    h = F.relu(_bn_eval(h, sd, f"{prefix}.second_conv.1"))
    h = F.conv1d(h, t(sd, f"{prefix}.second_conv.3.weight"), t(sd, f"{prefix}.second_conv.3.bias"))
    C = h.shape[1]
    return h.max(dim=2).values.reshape(B, G, C)


def pos_embed_torch(sd: dict, xyz: torch.Tensor, prefix: str = "pos_embed") -> torch.Tensor:
    h = F.linear(xyz, t(sd, f"{prefix}.0.weight"), t(sd, f"{prefix}.0.bias"))
    h = F.gelu(h)
    return F.linear(h, t(sd, f"{prefix}.2.weight"), t(sd, f"{prefix}.2.bias"))


def cls_head_torch(sd: dict, feat: torch.Tensor, prefix: str = "cls_head_finetune") -> torch.Tensor:
    h = F.linear(feat, t(sd, f"{prefix}.0.weight"), t(sd, f"{prefix}.0.bias"))
    h = F.relu(_bn_eval(h, sd, f"{prefix}.1"))
    h = F.linear(h, t(sd, f"{prefix}.4.weight"), t(sd, f"{prefix}.4.bias"))
    h = F.relu(_bn_eval(h, sd, f"{prefix}.5"))
    return F.linear(h, t(sd, f"{prefix}.8.weight"), t(sd, f"{prefix}.8.bias"))


# ---------------------------------------------------------------------------
# Graph + spectral (reference models/point_mamba.py:664-715 weighted
# adjacency; :717-761 per-sample rw-Laplacian eigh)
# ---------------------------------------------------------------------------

def adjacency_torch(center: torch.Tensor, k: int, alpha: float, symmetric: bool,
                    self_loop: bool, binary: bool) -> torch.Tensor:
    B, N, _ = center.shape
    d = torch.sqrt(((center[:, :, None, :] - center[:, None, :, :]) ** 2).sum(-1))
    dists, idx = torch.topk(-d, k=k + 1, largest=True, dim=-1)
    dists = -dists
    if not self_loop:
        idx = idx[:, :, 1:]
        dists = dists[..., 1:]
    A = torch.zeros(B, N, N)
    b_idx = torch.arange(B)[:, None, None]
    n_idx = torch.arange(N)[:, None]
    w = torch.ones_like(dists) if binary else torch.exp(-alpha * dists**2)
    A[b_idx, n_idx, idx] = w
    if symmetric:
        A[b_idx, idx, n_idx] = w
    return A


def eigh_rw_topk_torch(A: torch.Tensor, k: int, smallest: bool = True):
    """Per-sample loop exactly like the reference solver (:717-761):
    symmetrize A, deg+1e-6 inverse, L = I - D^-1 A, torch.linalg.eigh."""
    B, N, _ = A.shape
    vals = torch.zeros(B, k)
    vecs = torch.zeros(B, N, k)
    for i in range(B):
        Ai = (A[i] + A[i].t()) / 2
        deg = Ai.sum(dim=1)
        D_inv = torch.diag(1.0 / (deg + 1e-6))
        L = torch.eye(N) - D_inv @ Ai
        ev, evec = torch.linalg.eigh(L)
        if smallest:
            vals[i], vecs[i] = ev[:k], evec[:, :k]
        else:
            top_vals, top_idx = torch.topk(ev, k, largest=True, sorted=True)
            vals[i], vecs[i] = top_vals, evec[:, top_idx]
    return vals, vecs


def align_signs(vecs: torch.Tensor, ref: np.ndarray) -> torch.Tensor:
    """Flip each eigenvector's sign to match ``ref`` (the solver-arbitrary
    per-vector sign; see SURVEY.md §7.3). vecs/ref: (B, N, k)."""
    r = torch.from_numpy(np.asarray(ref, np.float32))
    s = torch.sign((vecs * r).sum(dim=1, keepdim=True))
    s = torch.where(s == 0, torch.ones_like(s), s)
    return vecs * s


def eig_cosines(vecs: torch.Tensor, ref: np.ndarray) -> np.ndarray:
    """|cos| between each torch eigenvector and the JAX one — degeneracy check."""
    r = torch.from_numpy(np.asarray(ref, np.float32))
    num = (vecs * r).sum(dim=1).abs()
    den = vecs.norm(dim=1) * r.norm(dim=1)
    return (num / den).numpy()


# ---------------------------------------------------------------------------
# Ordering (reference :817-826 sort_points_by_fiedler; :890-907 SAST concat;
# :955-990 reverse flip; :850-866 MAMBA xyz)
# ---------------------------------------------------------------------------

def sast_order_torch(tokens, pos, eigvecs, reverse=True):
    parts_t, parts_p = [], []
    k = eigvecs.shape[-1]
    C = tokens.shape[-1]
    for i in range(k):
        order = torch.sort(eigvecs[:, :, i], dim=1).indices
        parts_t.append(tokens.gather(1, order[..., None].expand(-1, -1, C)))
        parts_p.append(pos.gather(1, order[..., None].expand(-1, -1, C)))
    tok = torch.cat(parts_t, dim=1)
    pp = torch.cat(parts_p, dim=1)
    if reverse:
        tok = torch.cat([tok, tok.flip(1)], dim=1)
        pp = torch.cat([pp, pp.flip(1)], dim=1)
    return tok, pp


def xyz_order_torch(tokens, pos, center):
    C = tokens.shape[-1]
    toks, pps = [], []
    for d in range(3):
        order = center[:, :, d].argsort(dim=-1)
        toks.append(tokens.gather(1, order[..., None].expand(-1, -1, C)))
        pps.append(pos.gather(1, order[..., None].expand(-1, -1, C)))
    return torch.cat(toks, dim=1), torch.cat(pps, dim=1)


# ---------------------------------------------------------------------------
# Mamba mixer + MixerModel (mamba-ssm 1.1.1 S6 math; reference
# models/block.py:17-76 Block, models/point_mamba.py:178-272 MixerModel)
# ---------------------------------------------------------------------------

def mixer_torch(sd: dict, m: str, x: torch.Tensor, d_state: int = 16) -> torch.Tensor:
    """One Mamba-v1 mixer: in_proj -> causal dwconv4+silu -> x_proj ->
    selective scan (sequential, fp32 state) -> gate -> out_proj."""
    B, L, D = x.shape
    xz = x @ t(sd, f"{m}.in_proj.weight").T
    di = xz.shape[-1] // 2
    xi, z = xz[..., :di], xz[..., di:]
    W = t(sd, f"{m}.conv1d.weight").shape[-1]
    xi = F.conv1d(xi.transpose(1, 2), t(sd, f"{m}.conv1d.weight"),
                  t(sd, f"{m}.conv1d.bias"), padding=W - 1, groups=di)[..., :L]
    xi = F.silu(xi).transpose(1, 2)
    dt_rank = t(sd, f"{m}.dt_proj.weight").shape[-1]
    xdb = xi @ t(sd, f"{m}.x_proj.weight").T
    dt = F.softplus(xdb[..., :dt_rank] @ t(sd, f"{m}.dt_proj.weight").T
                    + t(sd, f"{m}.dt_proj.bias"))
    Bc = xdb[..., dt_rank:dt_rank + d_state]
    Cc = xdb[..., dt_rank + d_state:]
    A = -torch.exp(t(sd, f"{m}.A_log"))
    h = torch.zeros(B, di, d_state)
    ys = []
    for s_ in range(L):
        dA = torch.exp(dt[:, s_, :, None] * A[None])
        dBu = (dt[:, s_] * xi[:, s_])[:, :, None] * Bc[:, s_, None, :]
        h = dA * h + dBu
        ys.append(torch.einsum("bdn,bn->bd", h, Cc[:, s_]))
    y = torch.stack(ys, dim=1) + xi * t(sd, f"{m}.D")
    y = y * F.silu(z)
    return y @ t(sd, f"{m}.out_proj.weight").T


def mixer_stack_torch(sd: dict, prefix: str, depth: int, x: torch.Tensor,
                      pos: torch.Tensor) -> torch.Tensor:
    """MixerModel.forward: hidden = x + pos; Add->LN->Mixer blocks; final
    add + norm_f (non-fused path — the ground-truth math)."""
    hidden = x + pos
    residual = None
    D = hidden.shape[-1]
    for i in range(depth):
        b = f"{prefix}.layers.{i}"
        residual = hidden if residual is None else hidden + residual
        h = F.layer_norm(residual, (D,), t(sd, f"{b}.norm.weight"),
                         t(sd, f"{b}.norm.bias"), eps=1e-5)
        hidden = mixer_torch(sd, f"{b}.mixer", h)
    residual = hidden + residual if residual is not None else hidden
    return F.layer_norm(residual, (D,), t(sd, f"{prefix}.norm_f.weight"),
                        t(sd, f"{prefix}.norm_f.bias"), eps=1e-5)


# ---------------------------------------------------------------------------
# Full classification forward (reference PointMamba.forward :843-1125, eval
# mode, tau=None, use_wavelets=False — the published-results path)
# ---------------------------------------------------------------------------

def pointmamba_logits_torch(sd: dict, cfg, pts: np.ndarray,
                            eig_align: np.ndarray | None = None,
                            return_tensor: bool = False):
    """Returns (logits (B, cls) np, eigvecs (B, G, k) torch or None).

    ``eig_align``: JAX eigenvectors to sign-align against (the per-vector
    sign is solver-arbitrary; alignment makes the composed pipelines
    comparable — degeneracy is asserted separately via ``eig_cosines``).
    ``return_tensor``: keep logits a torch tensor on the autograd tape (for
    the train-step parity test, where sd holds requires_grad Parameters).
    A float64 ``pts`` keeps float64 (fp32-conditioning-floor measurements).
    """
    pts = np.asarray(pts)
    x = torch.from_numpy(pts if pts.dtype == np.float64
                         else pts.astype(np.float32))
    neigh, center = group_torch(x, cfg.num_group, cfg.group_size)
    tokens = encoder_torch(sd, neigh)
    pos = pos_embed_torch(sd, center)

    eigvecs = None
    if cfg.method == "SAST":
        A = adjacency_torch(center, cfg.knn_graph, cfg.alpha, cfg.symmetric,
                            cfg.self_loop, cfg.binary)
        _, eigvecs = eigh_rw_topk_torch(A, cfg.k_top_eigenvectors, cfg.smallest)
        if eig_align is not None:
            eigvecs = align_signs(eigvecs, eig_align)
        tok, pp = sast_order_torch(tokens, pos, eigvecs, reverse=cfg.reverse)
    elif cfg.method == "MAMBA":
        tok, pp = xyz_order_torch(tokens, pos, center)
    else:
        raise ValueError(cfg.method)

    h = mixer_stack_torch(sd, "blocks", cfg.depth, tok, pp)
    h = F.layer_norm(h, (cfg.trans_dim,), t(sd, "norm.weight"),
                     t(sd, "norm.bias"), eps=1e-5)
    feat = h.mean(dim=1)
    logits = cls_head_torch(sd, feat)
    if return_tensor:
        return logits, eigvecs
    return logits.detach().numpy(), eigvecs


# ---------------------------------------------------------------------------
# Point_MAE_Mamba pretrain loss (reference MaskMamba_2 eval path
# models/point_mamba.py:2453-2541 + Point_MAE_Mamba :3094-3219). Mask and
# traversal orders are *inputs* (like the reference's MaskMamba_2 ``orders``
# argument) so both pipelines can be driven with identical values.
# ---------------------------------------------------------------------------

def chamfer_l2_torch(x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
    """pytorch3d chamfer_distance semantics: per-cloud mean of min sq-dists,
    summed over both directions; returns per-sample (B,)."""
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(dim=2).values.mean(dim=1) + d.min(dim=1).values.mean(dim=1)


def mae_loss_torch(sd: dict, cfg, pts: np.ndarray, mask: np.ndarray,
                   orders: np.ndarray) -> float:
    """Eval-mode (hard-perm) MAE forward -> scalar chamfer loss.

    mask: (B, G) 0/1; orders: (B, K, G) int traversal orders.
    State-dict keys use the reference layout (MAE_encoder./MAE_decoder. etc.)
    already flattened by the caller to encoder./blocks./MAE_decoder.blocks…
    """
    x = torch.from_numpy(np.asarray(pts, np.float32))
    m = torch.from_numpy(np.asarray(mask)).bool()
    orders = torch.from_numpy(np.asarray(orders)).long()
    B, K, G = orders.shape
    neigh, center = group_torch(x, cfg.num_group, cfg.group_size)
    tokens = encoder_torch(sd, neigh)
    pos = pos_embed_torch(sd, center)
    C = tokens.shape[-1]
    n_mask = int(cfg.mask_ratio * G)
    n_vis = G - n_mask

    # P_hard one-hot (B, K, G, G); eval => P = P_hard (reference :2454-2459)
    P = F.one_hot(orders, G).float()

    # permute mask/tokens/pos/neighborhood per traversal (reference :2483-2515)
    mask_k = torch.matmul(P, m[:, None, :, None].float()).squeeze(-1).bool()  # (B,K,G)
    tok_k = torch.matmul(P, tokens[:, None])  # (B,K,G,C)
    pos_k = torch.matmul(P, pos[:, None])
    nbr_k = torch.einsum("bhij,bjkl->bhikl", P, neigh)  # (B,K,G,M,3)

    tok_vis = tok_k[~mask_k].view(B, -1, C)        # (B, K*n_vis, C)
    pos_vis = pos_k[~mask_k].view(B, -1, C)
    pos_msk = pos_k[mask_k].view(B, -1, C)
    pos_full = pos_k.flatten(1, 2)                 # (B, K*G, C)
    nbr_full = nbr_k.flatten(1, 2)                 # (B, K*G, M, 3)
    mask_flat = mask_k.flatten(1, 2)               # (B, K*G)

    assert cfg.reverse
    x_in = torch.cat([tok_vis, tok_vis.flip(1)], dim=1)
    pos_in = torch.cat([pos_vis, pos_vis.flip(1)], dim=1)
    pos_dec = torch.cat([pos_full, pos_full.flip(1)], dim=1)
    nbr_dec = torch.cat([nbr_full, nbr_full.flip(1)], dim=1)
    mask_rev = mask_flat.flip(-1)

    # encoder over visible tokens (reference :2537-2541)
    h = mixer_stack_torch(sd, "blocks", cfg.depth, x_in, pos_in)
    x_vis = F.layer_norm(h, (C,), t(sd, "norm.weight"), t(sd, "norm.bias"), eps=1e-5)

    # token restoration (reference :3150-3190): per-traversal canvases for
    # the forward half, one canvas for the flipped half
    mask_token = t(sd, "mask_token").reshape(1, 1, C).expand(B, 2 * K * n_mask, C)
    canvases = []
    for k in range(K):
        canvas = torch.zeros(B, G, C)
        mt = mask_token[:, k * n_mask:(k + 1) * n_mask]
        xv = x_vis[:, k * n_vis:(k + 1) * n_vis]
        mk = mask_k[:, k]
        canvas[mk] = mt.reshape(-1, C)[: int(mk.sum())]
        canvas[~mk] = xv.reshape(-1, C)[: int((~mk).sum())]
        canvases.append(canvas)
    canvas2 = torch.zeros(B, K * G, C)
    mt = mask_token[:, K * n_mask:]
    xv = x_vis[:, K * n_vis:]
    canvas2[mask_rev] = mt.reshape(-1, C)[: int(mask_rev.sum())]
    canvas2[~mask_rev] = xv.reshape(-1, C)[: int((~mask_rev).sum())]
    x_full = torch.cat(canvases + [canvas2], dim=1)  # (B, 2KG, C)

    # SST decoder: all tokens, final norm (reference :2837-2866)
    h = mixer_stack_torch(sd, "MAE_decoder.blocks", cfg.decoder_depth, x_full, pos_dec)
    x_rec = F.layer_norm(h, (C,), t(sd, "MAE_decoder.norm.weight"),
                         t(sd, "MAE_decoder.norm.bias"), eps=1e-5)

    final_mask = torch.cat([mask_flat, mask_rev], dim=1)  # (B, 2KG)
    x_masked = x_rec[final_mask].view(B, -1, C)
    M = x_masked.shape[1]
    rebuild = F.conv1d(x_masked.transpose(1, 2), t(sd, "increase_dim.0.weight"),
                       t(sd, "increase_dim.0.bias")).transpose(1, 2)
    rebuild = rebuild.reshape(B * M, -1, 3)
    gt = nbr_dec[final_mask].reshape(B * M, -1, 3)
    return float(chamfer_l2_torch(rebuild, gt).mean())


# ---------------------------------------------------------------------------
# Part-segmentation forward (reference part_segmentation/models/pt_mamba.py:
# 419-787 get_model + MixerModelForSegmentation :325-416 +
# PointNetFeaturePropagation pointnet2_utils.py:262-312), eval mode.
# ---------------------------------------------------------------------------

def mixer_stack_taps_torch(sd: dict, prefix: str, depth: int, x, pos,
                           fetch_idx):
    """MixerModelForSegmentation: Add->LN->Mixer blocks, norm_f-projected
    (hidden+residual) collected at ``fetch_idx``."""
    hidden = x + pos
    residual = None
    D = hidden.shape[-1]
    feats = []
    for i in range(depth):
        b = f"{prefix}.layers.{i}"
        residual = hidden if residual is None else hidden + residual
        h = F.layer_norm(residual, (D,), t(sd, f"{b}.norm.weight"),
                         t(sd, f"{b}.norm.bias"), eps=1e-5)
        hidden = mixer_torch(sd, f"{b}.mixer", h)
        if i in fetch_idx:
            out = hidden + residual
            feats.append(F.layer_norm(out, (D,), t(sd, f"{prefix}.norm_f.weight"),
                                      t(sd, f"{prefix}.norm_f.bias"), eps=1e-5))
    return feats


def interp3nn_torch(xyz1, xyz2, feats2):
    """3-NN inverse-distance interpolation (pointnet2_utils.py:273-312)."""
    d = ((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2).sum(-1)
    dists, idx = torch.topk(-d, 3, dim=-1)
    dists = torch.clamp(-dists, min=0.0)
    w = 1.0 / (dists + 1e-8)
    w = w / w.sum(dim=-1, keepdim=True)
    gathered = torch.gather(
        feats2[:, None].expand(-1, xyz1.shape[1], -1, -1), 2,
        idx[..., None].expand(-1, -1, -1, feats2.shape[-1]))
    return (gathered * w[..., None]).sum(dim=2)


def partseg_logp_torch(sd: dict, cfg, pts: np.ndarray, onehot: np.ndarray,
                       eig_align: np.ndarray | None = None):
    """Per-point log-probs of the seg model (SAST ordering), eval mode."""
    x = torch.from_numpy(np.asarray(pts, np.float32))
    oh = torch.from_numpy(np.asarray(onehot, np.float32))
    B, N, _ = x.shape
    neigh, center = group_torch(x, cfg.num_group, cfg.group_size)
    tokens = encoder_torch(sd, neigh)
    pos = pos_embed_torch(sd, center)

    A = adjacency_torch(center, cfg.knn_graph, cfg.alpha, cfg.symmetric,
                        cfg.self_loop, cfg.binary)
    _, eigvecs = eigh_rw_topk_torch(A, cfg.k_top_eigenvectors, cfg.smallest)
    if eig_align is not None:
        eigvecs = align_signs(eigvecs, eig_align)
    tok, pp = sast_order_torch(tokens, pos, eigvecs, reverse=cfg.reverse)
    cseq, _ = sast_order_torch(center, center, eigvecs, reverse=cfg.reverse)

    feats = mixer_stack_taps_torch(sd, "blocks", cfg.depth, tok, pp,
                                   cfg.fetch_idx)
    D = cfg.trans_dim
    seq_feat = torch.cat(
        [F.layer_norm(f, (D,), t(sd, "norm.weight"), t(sd, "norm.bias"),
                      eps=1e-5) for f in feats], dim=-1)

    x_max = seq_feat.max(dim=1).values
    x_avg = seq_feat.mean(dim=1)
    lbl = oh @ t(sd, "label_conv.weight").T
    lbl = F.leaky_relu(_bn_eval(lbl, sd, "label_bn"), 0.2)
    global_feat = torch.cat([x_max, x_avg, lbl], dim=-1)
    global_b = global_feat[:, None, :].expand(-1, N, -1)

    def bn_pts(v, stem):
        # feature-axis BN over (B, N, C): flatten to (B·N, C) for F.batch_norm
        C = v.shape[-1]
        return _bn_eval(v.reshape(-1, C), sd, stem).reshape(v.shape)

    interp = interp3nn_torch(x, cseq, seq_feat)
    f = torch.cat([x, interp], dim=-1)
    for i in (1, 2):
        f = F.linear(f, t(sd, f"prop_fc{i}.weight"), t(sd, f"prop_fc{i}.bias"))
        f = F.relu(bn_pts(f, f"prop_bn{i}"))

    h = torch.cat([f, global_b], dim=-1)
    h = F.relu(bn_pts(F.linear(h, t(sd, "convs1.weight"), t(sd, "convs1.bias")),
                      "bns1"))
    h = F.relu(bn_pts(F.linear(h, t(sd, "convs2.weight"), t(sd, "convs2.bias")),
                      "bns2"))
    h = F.linear(h, t(sd, "convs3.weight"), t(sd, "convs3.bias"))
    return F.log_softmax(h, dim=-1).numpy(), eigvecs


def ssd_chunked_torch(x, dt, A, Bm, Cm, D, chunk=128, return_carry=False):
    """float64 truth for the chunked scalar-decay SSD (ops/ssd.py semantics,
    itself beyond-reference — no /root/reference counterpart). Used by the
    on-chip fused-kernel tests to bound BOTH production paths against real
    math: on TPU, f32 einsums run at bf16 MXU precision, so comparing the
    two f32 paths against each other at 1e-4 is not a meaningful pin."""
    b, l, h, p = x.shape
    n = Bm.shape[-1]
    nc, q = l // chunk, chunk
    xh = x.permute(0, 2, 1, 3).reshape(b, h, nc, q, p)
    dth = dt.permute(0, 2, 1).reshape(b, h, nc, q)
    Bc = Bm.reshape(b, nc, q, n)
    Cc = Cm.reshape(b, nc, q, n)
    S = torch.cumsum(dth * A[None, :, None, None], dim=-1)  # (b,h,nc,q)
    xdt = xh * dth[..., None]
    logM = S[..., :, None] - S[..., None, :]
    tri = torch.tril(torch.ones(q, q, dtype=torch.bool))
    M = torch.exp(torch.where(tri, logM,
                              torch.tensor(-torch.inf, dtype=x.dtype)))
    G = torch.einsum("bcqn,bckn->bcqk", Cc, Bc)
    y_intra = torch.einsum("bhcqk,bhckp->bhcqp", G[:, None] * M, xdt)
    Send = S[..., -1:]
    T_end = torch.exp(Send - S)
    states = torch.einsum("bcqn,bhcqp->bhcnp", Bc, xdt * T_end[..., None])
    dec = torch.exp(Send[..., 0])                           # (b,h,nc)
    hs = [torch.zeros(b, h, n, p, dtype=x.dtype)]
    for c in range(nc):
        hs.append(dec[:, :, c, None, None] * hs[-1] + states[:, :, c])
    h_in = torch.stack(hs[:-1], dim=2)                      # (b,h,nc,n,p)
    y_inter = (torch.einsum("bcqn,bhcnp->bhcqp", Cc, h_in)
               * torch.exp(S)[..., None])
    y = (y_intra + y_inter).reshape(b, h, l, p).permute(0, 2, 1, 3)
    y = y + D[None, None, :, None] * x
    if return_carry:
        total_decay = torch.exp(S[..., -1].sum(-1))         # (b,h)
        return y, total_decay, hs[-1]
    return y
