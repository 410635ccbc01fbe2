"""Engine configuration.

Plays the role of the reference's startup config
(SketchServerConfig.java:86-122: fixed sketch declarations parsed once)
-- but as frozen dataclasses whose sha256 ``config_hash`` keys lineage
rows, so identical configs resume and changed configs recompute.

Everything downstream is deterministic in (config, input): permutation
seeds, LSH salts and band hashing all derive from the seed, never from
wall-clock or ``rand()``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

MERSENNE_61 = (1 << 61) - 1


@dataclass(frozen=True)
class ShingleConfig:
    """k-word shingles hashed to 64 bits (fixed seed).

    token_pattern is a MATCH pattern (re.findall semantics -- tokens are
    the runs the pattern matches), consumed verbatim by the signature
    UDF; the default is equivalent to splitting on non-alphanumeric runs
    and is what the DuckDB oracles replay.  Every field here feeds both
    the UDF and config_hash, so changing any of them invalidates lineage
    AND changes the signatures (never one without the other)."""

    k: int = 4
    lowercase: bool = True
    token_pattern: str = "[a-z0-9]+"

    def __post_init__(self) -> None:
        # token_pattern is MATCH semantics (tokens = what the pattern
        # matches).  A split-style pattern like '[^a-z0-9]+' would
        # silently invert meaning (tokens become the punctuation runs),
        # so reject the specific split-style idioms loudly -- but only
        # those: negated classes are legitimate MATCH patterns too
        # (e.g. '[^\\s]+' == '\\S+', tokens are non-whitespace runs).
        if not self.token_pattern:
            raise ValueError("token_pattern must be a non-empty MATCH regex")
        import re as _re

        # complement-of-a-word-charset classes ('[^a-z0-9]+', '[^\w]+',
        # '\W+', '\s+') match separator runs, not tokens
        split_idiom = _re.fullmatch(
            r"\[\^(?:[a-zA-Z0-9_\-]|\\[wd])+\]\+?", self.token_pattern
        )
        if split_idiom or self.token_pattern in (r"\s+", r"\W+"):
            raise ValueError(
                f"token_pattern {self.token_pattern!r} looks like a SPLIT "
                "pattern (it matches separator runs); this field uses MATCH "
                "semantics (tokens are the runs the pattern matches, e.g. "
                "'[a-z0-9]+' or '[^\\s]+')"
            )


@dataclass(frozen=True)
class MinHashConfig:
    """128-permutation MinHash + 64-bit SimHash, one fused vectorized pass."""

    num_perm: int = 128
    seed: int = 42
    simhash_bits: int = 64


@dataclass(frozen=True)
class LshConfig:
    """b bands x r rows over the MinHash signature.

    Defaults (b=32, r=4, b*r=128) give candidate probability
    1-(1-s^4)^32 ~ 0.9998 at s=0.7, so expected dup-pair recall at the
    default jaccard threshold 0.7 clears the >=0.99 contract with margin.
    """

    bands: int = 32
    rows_per_band: int = 4
    jaccard_threshold: float = 0.7
    # skew handling: hot band-buckets are salted into `salt_buckets`
    # sub-buckets, and any bucket is capped at `bucket_cap` members with
    # dropped-row counts logged (SURVEY.md section 4 custom work #1).
    bucket_cap: int = 2000
    salt_buckets: int = 8
    # buckets above this size take the salted two-phase path; the cold
    # majority keeps map-side-combined single-shuffle aggregation
    hot_bucket_threshold: int = 1024

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band > 128:
            raise ValueError("bands*rows_per_band must fit the signature")


@dataclass(frozen=True)
class SketchConfig:
    """k parameters for the sketch metric tables.

    Mirrors the reference's per-family k (SketchStorage.java:152-202):
    theta/hll take lg_k, kll takes k directly.
    """

    theta_lg_k: int = 12
    hll_lg_k: int = 12
    kll_k: int = 200
    frequency_top_k: int = 20
    sample_k: int = 32


@dataclass(frozen=True)
class PipelineConfig:
    shingle: ShingleConfig = field(default_factory=ShingleConfig)
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    lsh: LshConfig = field(default_factory=LshConfig)
    sketch: SketchConfig = field(default_factory=SketchConfig)
    # number of hash buckets used for per-partition lineage + metric
    # grouping; at 100 TB this would be O(10^4-10^5), locally small.
    num_buckets: int = 32

    def config_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
