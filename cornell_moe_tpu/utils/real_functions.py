"""Real-world benchmark objectives.

Counterpart of ``examples/real_functions.py`` in the reference: CIFAR10 (a
5-dim CNN hyperparameter-tuning objective, real_functions.py:31) and KISSGP
(a 3-dim GPML-hyperparameter objective via Octave, :161).

Differences: the reference trains a Keras CNN (50 epochs, downloads
CIFAR-10) inside a forked process; here the CNN is torch-CPU, the epoch
budget is configurable, and when the dataset is unavailable (zero-egress
environments) a deterministic synthetic image-classification task with the
same shapes stands in — the hyperparameter landscape (learning rate, batch
size, channel widths) remains nontrivial.  KISSGP requires Octave+GPML,
which this image lacks; it raises with instructions unless both exist.
"""

from __future__ import annotations

import os

import numpy as np


class CIFAR10:
    """Tune (log10 lr, batch size, log2 units x3) of a 6-conv-layer CNN.

    Search domain matches the reference (real_functions.py:33):
    [[-6, 0], [32, 512], [5, 9], [5, 9], [5, 9]].  evaluate() returns
    [validation error] (+ zero gradient channels for API parity).
    """

    def __init__(self, epochs: int = 2, data_dir: str | None = None,
                 subset: int = 2000, synthetic_fallback: bool = True,
                 seed: int = 0):
        self._dim = 5
        self._search_domain = np.array(
            [[-6.0, 0.0], [32.0, 512.0], [5.0, 9.0], [5.0, 9.0],
             [5.0, 9.0]])
        self._num_init_pts = 1
        self._sample_var = 0.0
        self._min_value = 0.0
        self._observations = []
        self._num_fidelity = 0
        self._epochs = epochs
        self._subset = subset
        self._seed = seed
        self._data = self._load_data(data_dir, synthetic_fallback)

    def _load_data(self, data_dir, synthetic_fallback):
        import torch

        path = data_dir or os.environ.get("CIFAR10_DIR")
        if path and os.path.exists(path):
            try:
                import pickle
                batches = []
                labels = []
                for i in range(1, 6):
                    with open(os.path.join(
                            path, f"data_batch_{i}"), "rb") as f:
                        d = pickle.load(f, encoding="bytes")
                    batches.append(d[b"data"])
                    labels.extend(d[b"labels"])
                x = np.concatenate(batches).reshape(-1, 3, 32, 32)
                y = np.asarray(labels)
                return (torch.tensor(x[:self._subset] / 255.0,
                                     dtype=torch.float32),
                        torch.tensor(y[:self._subset]))
            except Exception:
                pass
        if not synthetic_fallback:
            raise RuntimeError(
                "CIFAR-10 data not found; set CIFAR10_DIR or pass "
                "data_dir (zero-egress environments can use "
                "synthetic_fallback=True)")
        # deterministic synthetic stand-in with class-dependent structure
        g = torch.Generator().manual_seed(self._seed)
        n = self._subset
        y = torch.randint(0, 10, (n,), generator=g)
        base = torch.randn(10, 3, 32, 32, generator=g)
        x = base[y] + 0.8 * torch.randn(n, 3, 32, 32, generator=g)
        return x, y

    def _build_model(self, unit1, unit2, unit3):
        import torch.nn as nn

        def block(cin, cout):
            return [nn.Conv2d(cin, cout, 3, padding=1), nn.ReLU(),
                    nn.Conv2d(cout, cout, 3), nn.ReLU(), nn.MaxPool2d(2)]

        return nn.Sequential(
            *block(3, unit1), *block(unit1, unit2), *block(unit2, unit3),
            nn.Flatten(), nn.LazyLinear(10))

    def train(self, x):
        import torch
        import torch.nn as nn

        torch.manual_seed(self._seed)
        lr_log, batch_size, u1, u2, u3 = np.asarray(x, dtype=float)
        lr = 10.0 ** lr_log
        batch_size = int(batch_size)
        units = [int(2 ** round(u)) for u in (u1, u2, u3)]

        data_x, data_y = self._data
        n = data_x.shape[0]
        n_train = int(0.8 * n)
        model = self._build_model(*units)
        opt = torch.optim.Adam(model.parameters(), lr=lr)
        loss_fn = nn.CrossEntropyLoss()

        model.train()
        for _ in range(self._epochs):
            perm = torch.randperm(n_train)
            for i in range(0, n_train, batch_size):
                idx = perm[i:i + batch_size]
                opt.zero_grad()
                loss = loss_fn(model(data_x[idx]), data_y[idx])
                if not torch.isfinite(loss):
                    return 1.0      # diverged: worst-case error
                loss.backward()
                opt.step()

        model.eval()
        with torch.no_grad():
            logits = model(data_x[n_train:])
            acc = (logits.argmax(1) == data_y[n_train:]).float().mean()
        return 1.0 - float(acc)      # validation error (minimize)

    def evaluate_true(self, x):
        return np.concatenate([[self.train(x)], np.zeros(self._dim)])

    def evaluate(self, x):
        return self.evaluate_true(x)


class KISSGP:
    """GPML KISS-GP marginal-likelihood objective (real_functions.py:161).

    Requires Octave + oct2py + the GPML toolbox; raises otherwise.
    """

    def __init__(self):
        self._dim = 3
        self._search_domain = np.repeat([[-1.0, 3.0]], 3, axis=0)
        self._num_init_pts = 1
        self._sample_var = 0.0
        self._min_value = 0.0
        self._observations = []
        self._num_fidelity = 0

    def evaluate_true(self, x):
        try:
            from oct2py import octave  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "KISSGP requires Octave + oct2py + the GPML Matlab "
                "toolbox (as in the reference's real_functions.py:161); "
                "not available in this environment") from e
        ell, sf, noise = (10.0 ** v for v in np.asarray(x, dtype=float))
        octave.addpath(os.environ.get("GPML_PATH", "gpml"))
        nlz = octave.kissgp_objective(ell, sf, noise)
        return np.concatenate([[float(nlz)], np.zeros(self._dim)])

    def evaluate(self, x):
        return self.evaluate_true(x)
