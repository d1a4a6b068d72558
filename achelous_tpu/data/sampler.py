"""Multi-host input sharding — the TPU-native DistributedSampler.

The reference shards its dataset across DDP ranks with
`torch.utils.data.distributed.DistributedSampler` (train.py:576-580).  On
TPU pods the analogue is per-PROCESS sharding: every host loads only the
slice of each (globally agreed) epoch permutation that feeds its local
devices, and `jax.make_array_from_process_local_data` assembles the global
batch (see parallel/mesh.py:global_shard_batch).

Semantics mirror torch's sampler exactly:
  * all replicas draw the SAME permutation (seed + epoch), so no
    communication is needed to agree on it;
  * the index list is padded by wrapping to a multiple of num_replicas
    (drop_last=False) or truncated (drop_last=True);
  * replica r takes indices[r::num_replicas] — the interleaved split.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class DistributedSampler:
    """Deterministic per-process epoch index shards.

    reference train.py:576-580 (torch DistributedSampler + batch_size //=
    ngpus); rank/num_replicas default to this process's position in the
    jax runtime.
    """

    def __init__(self, n: int, num_replicas: Optional[int] = None,
                 rank: Optional[int] = None, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False):
        if num_replicas is None or rank is None:
            import jax
            num_replicas = num_replicas or jax.process_count()
            rank = jax.process_index() if rank is None else rank
        if not 0 <= rank < num_replicas:
            raise ValueError(f"rank {rank} not in [0, {num_replicas})")
        self.n = n
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        if drop_last:
            self.num_samples = n // num_replicas
        else:
            self.num_samples = -(-n // num_replicas)   # ceil
        self.total_size = self.num_samples * num_replicas

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """This replica's dataset indices for one epoch ([num_samples])."""
        if self.shuffle:
            # same (seed, epoch) => same permutation on every host
            idx = np.random.RandomState(self.seed + epoch).permutation(self.n)
        else:
            idx = np.arange(self.n)
        if self.drop_last:
            idx = idx[:self.total_size]
        elif len(idx) < self.total_size:       # pad by wrapping (torch does
            reps = -(-self.total_size // len(idx))   # the same)
            idx = np.tile(idx, reps)[:self.total_size]
        return idx[self.rank::self.num_replicas]
