"""Fuzz the URL canonicalizer: variant-equivalence + idempotence.

Two properties the curated cases in test_urltools.py can't sweep:

1. **Variant equivalence** — every crawl-revisit spelling of one logical
   URL (scheme/host case, default port, fragment, tracking params, query
   order, doubled slashes, trailing slash) canonicalizes to the SAME
   string.  This is the contract url_canonical_dedup's groupBy rests on.
2. **Idempotence** — ``canonical_url(canonical_url(x)) == canonical_url(x)``
   for arbitrary messy input, so re-canonicalizing an already-deduped
   table is a no-op (incremental runs re-apply the projection freely).

Generation is seeded ``random`` (deterministic corpus), evaluated in ONE
Spark projection per property — no per-example JVM round-trips.
"""

import random
import string

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.functions.urltools import canonical_url

SEED = 20260820
N_LOGICAL = 60
VARIANTS_PER = 5

_SEG = string.ascii_letters + string.digits + "-_.~"
_TRACKERS = ["utm_source=x", "utm_campaign=Y2", "utm_", "fbclid=AbC1", "gclid=9z", "ref=home"]


def _rand_case(rng, s):
    return "".join(c.upper() if rng.random() < 0.5 else c.lower() for c in s)


def _logical(rng):
    """One logical URL as components."""
    scheme = rng.choice(["http", "https"])
    host = ".".join(
        "".join(rng.choices(string.ascii_lowercase + string.digits, k=rng.randint(1, 8)))
        for _ in range(rng.randint(2, 3))
    )
    # non-default port half the time; None means "default port allowed as a spelling"
    port = rng.choice([None, None, 8080, 8443, 81])
    segs = ["".join(rng.choices(_SEG, k=rng.randint(1, 10))) for _ in range(rng.randint(0, 4))]
    # distinct non-tracking keys; values from the safe charset
    keys = rng.sample([f"k{i}" for i in range(10)] + ["reference", "refx", "q"], k=rng.randint(0, 4))
    params = [f"{k}={''.join(rng.choices(_SEG, k=rng.randint(0, 6)))}" for k in keys]
    return scheme, host, port, segs, params


def _canonical_of(scheme, host, port, segs, params):
    path = "/" + "/".join(segs) if segs else "/"
    q = "&".join(sorted(params))
    p = f":{port}" if port else ""
    return f"{scheme}://{host}{p}{path}" + (f"?{q}" if q else "")


def _spell(rng, scheme, host, port, segs, params):
    """One messy-but-equivalent spelling."""
    s = _rand_case(rng, scheme)
    h = _rand_case(rng, host)
    if port:
        p = f":{port}"
    else:
        # default port spelled out or omitted — both map to omitted
        p = {"http": ":80", "https": ":443"}[scheme] if rng.random() < 0.5 else ""
    sep = lambda: "/" * rng.randint(1, 3)  # noqa: E731
    path = "".join(sep() + seg for seg in segs) if segs else ""
    if rng.random() < 0.5:
        path += sep()  # trailing slash(es) — dropped unless root
    if path == "":
        path = "/" if rng.random() < 0.5 else ""
    q = list(params) + rng.sample(_TRACKERS, k=rng.randint(0, 3))
    rng.shuffle(q)
    if q and rng.random() < 0.3:
        q.insert(rng.randint(0, len(q)), "")  # empty param from '&&'
    frag = "#" + "".join(rng.choices(_SEG, k=rng.randint(0, 6))) if rng.random() < 0.5 else ""
    qs = "?" + "&".join(q) if q else ("?" if rng.random() < 0.1 else "")
    return f"{s}://{h}{p}{path}{qs}{frag}"


def _eval(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i: int, url: string"
    )
    rows = df.select(
        "i",
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    ).collect()
    out = [None] * len(urls)
    for r in rows:
        out[r.i] = (r.c1, r.c2)
    return out


def test_variant_equivalence_and_idempotence(spark):
    rng = random.Random(SEED)
    urls, want = [], []
    for _ in range(N_LOGICAL):
        comp = _logical(rng)
        expected = _canonical_of(*comp)
        for _ in range(VARIANTS_PER):
            urls.append(_spell(rng, *comp))
            want.append(expected)
    got = _eval(spark, urls)
    for u, expected, (c1, c2) in zip(urls, want, got):
        assert c1 == expected, f"{u!r}: {c1!r} != {expected!r}"
        assert c2 == c1, f"not idempotent on {u!r}: {c2!r} != {c1!r}"


def test_idempotence_on_garbage(spark):
    """Totality + idempotence on inputs that are not URLs at all."""
    rng = random.Random(SEED + 1)
    alphabet = string.printable.replace("\x0b", "").replace("\x0c", "")
    urls = [
        "".join(rng.choices(alphabet, k=rng.randint(0, 40))).replace("\r", " ").replace("\n", " ")
        for _ in range(150)
    ] + ["", " ", "://", "http://", "a://b", "?", "#", "http://?#", "http://#?"]
    got = _eval(spark, urls)
    for u, (c1, c2) in zip(urls, got):
        assert c1 is not None, f"null canonical for {u!r}"
        assert c2 == c1, f"not idempotent on {u!r}: {c2!r} != {c1!r}"
