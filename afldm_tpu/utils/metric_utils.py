"""Feature-statistics utilities supporting metric loops (parity surface for
the reference's af_libs/metric_utils.py:24-302: FeatureStats accumulates
counts/means/covariances across batches and workers; ProgressMonitor tracks
throughput). The feature detector download machinery is replaced by a
caller-supplied feature function (zero egress)."""

import time

import numpy as np


class FeatureStats:
    """Accumulate raw features and/or mean+covariance
    (ref metric_utils.py:79-158)."""

    def __init__(self, capture_all=False, capture_mean_cov=False,
                 max_items=None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = None
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features):
        if self.num_features is not None:
            assert num_features == self.num_features
            return
        self.num_features = num_features
        self.all_features = []
        self.raw_mean = np.zeros(num_features, np.float64)
        self.raw_cov = np.zeros((num_features, num_features), np.float64)

    def is_full(self):
        return (self.max_items is not None
                and self.num_items >= self.max_items)

    def append(self, x):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[: self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self):
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def merge(self, other):
        """Cross-worker reduction (the reference all-gathers tensors;
        host-side merge here — the on-device path is a psum of
        [n, sum, sum_outer])."""
        assert self.capture_all == other.capture_all
        if other.num_features is None:
            return self
        self.set_num_features(other.num_features)
        self.num_items += other.num_items
        if self.capture_all:
            self.all_features.extend(other.all_features)
        if self.capture_mean_cov:
            self.raw_mean += other.raw_mean
            self.raw_cov += other.raw_cov
        return self


class ProgressMonitor:
    """Throughput/progress reporting (ref metric_utils.py:161-209)."""

    def __init__(self, tag=None, num_items=None, verbose=True,
                 flush_interval=1000):
        self.tag = tag
        self.num_items = num_items
        self.verbose = verbose
        self.flush_interval = flush_interval
        self.start_time = time.time()
        self.batch_time = self.start_time
        self.batch_items = 0

    def update(self, cur_items):
        assert self.num_items is None or cur_items <= self.num_items
        if (cur_items < self.batch_items + self.flush_interval
                and (self.num_items is None or cur_items < self.num_items)):
            return
        now = time.time()
        total_time = now - self.start_time
        time_per_item = ((now - self.batch_time)
                         / max(cur_items - self.batch_items, 1))
        if self.verbose:
            print(f"{self.tag or 'progress':<20s} items {cur_items:<8d} "
                  f"time {total_time:<8.1f}s "
                  f"items/s {1 / max(time_per_item, 1e-9):.2f}")
        self.batch_time = now
        self.batch_items = cur_items

    def sub(self, tag=None, num_items=None):
        return ProgressMonitor(tag=tag, num_items=num_items,
                               verbose=self.verbose,
                               flush_interval=self.flush_interval)


def frechet_distance(stats_a, stats_b):
    """Frechet distance between two FeatureStats with captured mean+cov —
    the FID formula StyleGAN-3's metrics compute from the stats the
    reference's FeatureStats accumulates (ref af_libs/metric_utils.py:79-158
    is the accumulator; the consumer metrics dir is trimmed upstream):

        |mu_a - mu_b|^2 + tr(C_a + C_b - 2 sqrtm(C_a C_b))

    Singular covariances (few samples vs feature dim) get the standard
    eps*I diagonal offset before the matrix square root.
    """
    import warnings

    import scipy.linalg

    def sqrtm(x):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")   # LinAlgWarning on singular x
            s = np.real(scipy.linalg.sqrtm(x))
        err = (np.linalg.norm(s @ s - x) /
               max(float(np.linalg.norm(x)), 1e-30))
        return s, err

    mu_a, cov_a = stats_a.get_mean_cov()
    mu_b, cov_b = stats_b.get_mean_cov()
    m = float(np.square(mu_a - mu_b).sum())
    s, err = sqrtm(cov_a @ cov_b)
    if not np.isfinite(err) or err > 1e-2:
        eps = 1e-6 * np.eye(cov_a.shape[0])
        s, _ = sqrtm((cov_a + eps) @ (cov_b + eps))
    return float(m + np.trace(cov_a + cov_b - 2.0 * s))
