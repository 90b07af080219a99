"""Robots-rules politeness filter: longest-prefix-match URL decisions.

The crawl-side gate every web corpus is built behind (RFC 9309): per
host, a set of (path-prefix, allow|deny) rules; a URL's verdict is
decided by the LONGEST matching prefix, an allow rule winning an
equal-length tie. This is genuinely different machinery from the
dictionary scan (pattern_scan) and the canonicalizer: matching is
per-(url, rule) with a per-URL argmax over variable-length rule sets.

Scale shape: the ruleset is crawl metadata — millions of hosts at
most, kilobytes per host — broadcast ONCE via ``ray.put`` (sorted
host-keyed arrays); every batch probes it with ``np.searchsorted`` to
get its per-host rule slices, evaluates all (url, rule) candidate
pairs with numpy's elementwise ``startswith`` (no Python loop over
rows), and resolves the argmax with a lexsort. No shuffle: the
decision is a stateless map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def split_host_path(urls: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 'scheme://host/path' split (no query/fragment
    handling — feed canonicalized URLs)."""
    u = np.asarray(urls, dtype="U")
    rest = np.char.partition(u, "://")[:, 2]
    parts = np.char.partition(rest, "/")
    host = parts[:, 0]
    path = np.char.add("/", parts[:, 2])
    return host, path


class RobotsIndex:
    """Host-sorted rule arrays, built once and shared via the object
    store (one ``ray.put``, read by every task)."""

    def __init__(self, rules: pd.DataFrame):
        # rules: host, prefix, allow (bool)
        r = rules.sort_values("host", kind="stable").reset_index(drop=True)
        self.hosts = r["host"].to_numpy(dtype="U")
        self.prefixes = r["prefix"].to_numpy(dtype="U")
        self.allow = r["allow"].to_numpy(dtype=bool)
        self.plen = np.char.str_len(self.prefixes).astype(np.int64)
        # per-host slice bounds
        self.uniq_hosts, starts = np.unique(self.hosts,
                                            return_index=True)
        self.starts = starts
        self.ends = np.append(starts[1:], len(self.hosts))

    def decide(self, urls: np.ndarray,
               default_allow: bool = True) -> np.ndarray:
        """Boolean verdict per URL, longest-prefix-match, allow wins
        length ties, hosts with no rules get ``default_allow``."""
        host, path = split_host_path(urls)
        hi = np.searchsorted(self.uniq_hosts, host)
        hic = np.clip(hi, 0, len(self.uniq_hosts) - 1)
        known = (len(self.uniq_hosts) > 0) & \
            (self.uniq_hosts[hic] == host)
        out = np.full(len(urls), default_allow, dtype=bool)
        if not known.any():
            return out
        # explode (url, rule) candidate pairs for known hosts
        idx = np.nonzero(known)[0]
        s = self.starts[hic[idx]]
        e = self.ends[hic[idx]]
        n = e - s
        url_rep = np.repeat(idx, n)
        rule_idx = np.concatenate(
            [np.arange(a, b) for a, b in zip(s, e)]) if len(idx) else \
            np.array([], dtype=np.int64)
        m = np.char.startswith(path[url_rep], self.prefixes[rule_idx])
        url_rep, rule_idx = url_rep[m], rule_idx[m]
        if len(url_rep) == 0:
            return out
        # argmax per url over (prefix length, allow): lexsort ascending,
        # keep each url's LAST row
        order = np.lexsort((self.allow[rule_idx].astype(np.int8),
                            self.plen[rule_idx], url_rep))
        u_sorted = url_rep[order]
        last = np.nonzero(np.append(u_sorted[1:] != u_sorted[:-1],
                                    True))[0]
        out[u_sorted[last]] = self.allow[rule_idx[order][last]]
        # matched-rule-free urls on known hosts keep the default
        return out


def robots_filter(ds, url_col: str, rules: pd.DataFrame,
                  default_allow: bool = True, out_col: str = "allowed"):
    """Append a boolean verdict column — broadcast rules, stateless map."""
    import ray

    ref = ray.put(RobotsIndex(rules))

    def _f(b: pa.Table) -> pa.Table:
        idx = ray.get(ref)
        urls = np.asarray(b.column(url_col).to_pylist(), dtype="U")
        return b.append_column(out_col,
                               pa.array(idx.decide(urls, default_allow)))

    return ds.map_batches(_f, batch_format="pyarrow")
