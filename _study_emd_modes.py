#!/usr/bin/env python
"""Numpy study: convergence-exit + eps-scaling quality/iteration
trade-offs for the auction EMD (VERDICT r4 next #3).

Replicates ops/emd.py::_auction's update rule (active rows only — the
math is identical; see _study_auction.py) and measures, for several
modes, (a) total iterations, (b) mean matched distance recomputed from
the returned assignment (the reference's own verification,
emd_module.py:81-95), (c) assignment uniqueness.

Modes:
  exact            : reference semantics — run to full assignment or
                     the 1024-iteration budget, force-assign the rest.
  floor=F          : exit once unassigned <= F; force-assign the rest.
  scale=th,phases  : eps-scaling — phases at eps*th^(p-1-i), price
                     carried across phases, assignments reset; each
                     phase exits on its own convergence (floor 0).
"""
import numpy as np


def run_auction(value_base, eps, iters, assignment=None, price=None, floor=0):
    n = value_base.shape[0]
    if assignment is None:
        assignment = np.full(n, -1, np.int64)
    assignment_inv = np.full(n, -1, np.int64)
    assignment_inv[assignment[assignment >= 0]] = np.flatnonzero(assignment >= 0)
    if price is None:
        price = np.zeros(n, np.float32)
    it = 0
    for it in range(1, iters + 1):
        unass = np.flatnonzero(assignment < 0)
        if unass.size <= floor:
            it -= 1
            break
        val = value_base[unass] - price[None, :]
        order = np.argsort(-val, axis=1, kind="stable")
        best_j = order[:, 0]
        best = val[np.arange(unass.size), best_j]
        better = val[np.arange(unass.size), order[:, 1]]
        inc = (best - better + eps).astype(np.float32)
        winner_inc = np.full(n, -np.inf, np.float32)
        np.maximum.at(winner_inc, best_j, inc)
        is_winner = inc >= winner_inc[best_j]
        winner_row = np.full(n, -1, np.int64)
        for r, j, w in zip(unass[::-1], best_j[::-1], is_winner[::-1]):
            if w:
                winner_row[j] = r
        claimed = winner_row >= 0
        for j in np.flatnonzero(claimed):
            prev = assignment_inv[j]
            if prev >= 0:
                assignment[prev] = -1
            assignment[winner_row[j]] = j
            assignment_inv[j] = winner_row[j]
            price[j] += winner_inc[j]
    return assignment, price, it


def finish(value_base, assignment, price, dist):
    unass = assignment < 0
    if unass.any():
        val = value_base[unass] - price[None, :]
        assignment = assignment.copy()
        assignment[unass] = np.argmax(val, axis=1)
    d = dist[np.arange(len(assignment)), assignment]
    uniq = len(np.unique(assignment))
    return float((d ** 2).mean()), uniq, int(unass.sum())


def main(n=4096, eps=0.02, iters=1024, seed=0):
    rng = np.random.default_rng(seed)
    x1 = rng.random((n, 3)).astype(np.float32)
    x2 = rng.random((n, 3)).astype(np.float32)
    dist = np.sqrt(((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1))
    vb = (3.0 - dist).astype(np.float32)

    a, p, it = run_auction(vb, eps, iters)
    md, uniq, forced = finish(vb, a, p, dist)
    print(f"exact: iters={it} mean_sqdist={md:.6f} unique={uniq} forced={forced}")
    base_md = md

    for floor in (16, 41, 64, 128, 256):
        a, p, it = run_auction(vb, eps, iters, floor=floor)
        md, uniq, forced = finish(vb, a, p, dist)
        print(
            f"floor={floor}: iters={it} mean_sqdist={md:.6f} "
            f"(+{(md / base_md - 1) * 100:.2f}%) unique={uniq} forced={forced}"
        )

    for theta, phases in ((5.0, 3), (4.0, 4), (10.0, 2)):
        total = 0
        price = None
        a = None
        for ph in range(phases):
            e = eps * theta ** (phases - 1 - ph)
            a, price, it = run_auction(
                vb, e, iters - total, assignment=None, price=price
            )
            total += it
        md, uniq, forced = finish(vb, a, price, dist)
        print(
            f"scale theta={theta} phases={phases}: iters={total} "
            f"mean_sqdist={md:.6f} (+{(md / base_md - 1) * 100:.2f}%) "
            f"unique={uniq} forced={forced}"
        )
        # scaling + floor on every phase
        total = 0
        price = None
        a = None
        for ph in range(phases):
            e = eps * theta ** (phases - 1 - ph)
            a, price, it = run_auction(
                vb, e, iters - total, assignment=None, price=price, floor=41
            )
            total += it
        md, uniq, forced = finish(vb, a, price, dist)
        print(
            f"scale theta={theta} phases={phases} +floor=41: iters={total} "
            f"mean_sqdist={md:.6f} (+{(md / base_md - 1) * 100:.2f}%) "
            f"unique={uniq} forced={forced}"
        )


if __name__ == "__main__":
    main()
