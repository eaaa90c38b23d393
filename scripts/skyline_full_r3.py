"""Weighted 2-hop skyline at FULL cosmetics scale (context for TRAIN_FULL).

The headroom study computed the model-free weighted co-occurrence skyline
(S = R_val @ (R^T R)) at 1/10 scale; this computes it on the EXACT full-
scale corpus/split of TRAIN_FULL_r3 so the trained val R@20 (0.316) can be
read against the strongest simple collaborative scorer on the same split.
Memory-safe: per-chunk dense [C, n_users] x sparse products, ~1.6 GB peak.
Pure CPU. Writes scripts/skyline_full_r3.json.
"""
import json
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from full_corpus_r3 import build_prepared  # noqa: E402

K = 20


def main():
    t0 = time.time()
    prepared, _ = build_prepared()
    nu, ni = prepared.n_users, prepared.n_items
    print(f"prepared {nu}x{ni} in {time.time()-t0:.0f}s", flush=True)

    Rw = sp.csr_matrix(
        (prepared.edge_weight.astype(np.float32),
         (prepared.edge_user, prepared.edge_item_node - nu)),
        shape=(nu, ni),
    )
    RwT = Rw.T.tocsr()
    val = prepared.val
    vids = val.user_ids
    recs = []
    t0 = time.time()
    CH = 128  # [CH, n_users] dense transient = ~800 MB at 1.55M users
    for lo in range(0, len(vids), CH):
        chunk = vids[lo:lo + CH]
        # S = (Rw[chunk] @ Rw^T) @ Rw, chunked. Dense x sparse keeps the
        # [C, n_users] intermediate dense (a sparse-sparse product there
        # would allocate near-dense nnz with 8 B/entry — worse).
        uu = np.asarray(Rw[chunk].toarray() @ RwT)  # [C,ni] @ [ni,nu] dense
        S = np.asarray(uu @ Rw)                     # [C, n_items]
        # Remove the self-contribution (the user's own 0-hop weight echo is
        # fine to keep — it scores their OWN items, which the mask removes).
        for r in range(len(chunk)):
            row = lo + r
            m = val.train_mask.row(row)
            s = S[r]
            if len(m):
                s[m] = -np.inf
            top = np.argpartition(s, -K)[-K:]
            t = val.truth.row(row)
            recs.append(len(np.intersect1d(top, t)) / max(1, len(t)))
        if lo % (CH * 10) == 0:
            print(f"{lo}/{len(vids)} users ({time.time()-t0:.0f}s)", flush=True)
    skyline = float(np.mean(recs))
    out = {
        "metric": "weighted 2-hop co-occurrence skyline, val Recall@20",
        "value": round(skyline, 5),
        "n_val_users": len(vids),
        "lightgcn_trained_val_recall_at_20": 0.3163,
        "popularity_baseline": 0.03443,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out, indent=2), flush=True)
    with open("/root/repo/scripts/skyline_full_r3.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
