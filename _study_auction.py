#!/usr/bin/env python
"""Numpy study of the Jacobi auction's convergence trajectory.

Question (round 4): the on-chip probe showed the reference-parameter
auction (n=4096, eps=0.02) runs its full 1024 iterations netting ~4
assignments/iter. If the unassigned count collapses early and the tail
dominates, an active-set sweep (process at most R unassigned rows per
iteration) cuts total sweep work by sum(active)/sum(n) without hurting
convergence. This replicates ops/emd.py::_auction's exact update rule
in numpy and prints the unassigned-count trajectory + the work ratio
for several R.
"""
import numpy as np


def auction_trajectory(n=4096, eps=0.02, iters=1024, seed=0, active_cap=None):
    rng = np.random.default_rng(seed)
    x1 = rng.random((n, 3)).astype(np.float32)
    x2 = rng.random((n, 3)).astype(np.float32)
    dist = np.sqrt(((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1))
    value_base = 3.0 - dist                      # matches ops/emd.py
    assignment = np.full(n, -1, np.int64)        # row -> col
    assignment_inv = np.full(n, -1, np.int64)    # col -> row
    price = np.zeros(n, np.float32)
    traj = []
    total_rows_swept = 0
    for it in range(iters):
        unass = np.flatnonzero(assignment < 0)
        if unass.size == 0:
            break
        if active_cap is not None and unass.size > active_cap:
            unass = unass[:active_cap]
        traj.append(unass.size)
        total_rows_swept += unass.size
        val = value_base[unass] - price[None, :]
        order = np.argsort(-val, axis=1, kind="stable")
        best_j = order[:, 0]
        best = val[np.arange(unass.size), best_j]
        better = val[np.arange(unass.size), order[:, 1]]
        inc = best - better + eps
        # one winner per column: the max-increment bidder (ties: first)
        winner_inc = np.full(n, -np.inf, np.float32)
        np.maximum.at(winner_inc, best_j, inc)
        is_winner = inc >= winner_inc[best_j]
        # lowest row index among winners for a column (parity with the
        # scatter-max; exact tie handling differs but is immaterial here)
        winner_row = np.full(n, -1, np.int64)
        for r, j, w in zip(unass[::-1], best_j[::-1], is_winner[::-1]):
            if w:
                winner_row[j] = r
        won_cols = np.flatnonzero(winner_row >= 0)
        for j in won_cols:
            r = winner_row[j]
            old = assignment_inv[j]
            if old >= 0:
                assignment[old] = -1
            assignment[r] = j
            assignment_inv[j] = r
        price[won_cols] += winner_inc[won_cols]
    return np.array(traj), total_rows_swept, int((assignment < 0).sum()), it + 1


def main():
    base_traj, base_work, base_left, base_iters = auction_trajectory()
    print(f"full Jacobi: iters={base_iters} left={base_left} "
          f"rows_swept={base_work} ({base_work / 4096:.0f} full-sweep equiv)")
    marks = [0, 10, 25, 50, 100, 200, 400, 700, 1000]
    print("unassigned @ iter:",
          {m: int(base_traj[m]) for m in marks if m < len(base_traj)})
    for cap in (256, 512, 1024):
        traj, work, left, iters = auction_trajectory(active_cap=cap)
        print(f"active-set R={cap}: iters={iters} left={left} "
              f"rows_swept={work} -> work ratio {work / base_work:.3f}")


if __name__ == "__main__":
    main()
