"""Property-based tests (hypothesis) for the pure-Python kernels — no
Spark session needed, so these run in milliseconds and sweep far more of
the input space than example-based tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fess_ds_s3_spark.functions.urls import canonicalize_url_py
from fess_ds_s3_spark.operators.dedup import _simhash_blocks
from fess_ds_s3_spark.operators.robots import robots_allowed, rule_matches


class TestSimhashBlocking:
    @given(sig=st.integers(0, 2**64 - 1),
           radius=st.integers(0, 63),
           flips=st.lists(st.integers(0, 63), max_size=63, unique=True))
    @settings(max_examples=300)
    def test_pigeonhole_guarantee(self, sig, radius, flips):
        """Any pair within Hamming ≤ r must share at least one exact block
        under the (r+1)-block split — the recall guarantee candidate
        generation relies on."""
        other = sig
        for bit in flips[:radius]:  # ≤ radius flips → Hamming ≤ radius
            other ^= 1 << bit
        shares = False
        for shift, width in _simhash_blocks(radius):
            mask = ((1 << width) - 1) << shift
            if (sig & mask) == (other & mask):
                shares = True
                break
        assert shares

    @given(radius=st.integers(0, 63))
    def test_blocks_partition_64_bits(self, radius):
        blocks = _simhash_blocks(radius)
        covered = 0
        for shift, width in blocks:
            mask = ((1 << width) - 1) << shift
            assert covered & mask == 0  # non-overlapping
            covered |= mask
        assert covered == 2**64 - 1


class TestCanonicalization:
    @given(host=st.from_regex(r"[a-zA-Z0-9.-]{1,20}", fullmatch=True),
           path=st.from_regex(r"(/[a-zA-Z0-9._ %-]{0,10}){0,4}",
                              fullmatch=True),
           scheme=st.sampled_from(["http", "https"]),
           port=st.sampled_from(["", ":80", ":443", ":8080"]))
    @settings(max_examples=300)
    def test_idempotent(self, host, path, scheme, port):
        """canonicalize(canonicalize(u)) == canonicalize(u) — the stored
        canonical_url column must be a fixed point, or re-ingesting
        discovered links would churn the seen-set."""
        url = f"{scheme}://{host}{port}{path}"
        once = canonicalize_url_py(url)
        assert canonicalize_url_py(once) == once


class TestRobotsMatching:
    @given(path=st.from_regex(r"(/[a-z0-9]{0,6}){1,4}", fullmatch=True))
    @settings(max_examples=200)
    def test_empty_rules_allow_everything(self, path):
        assert robots_allowed([], "any-agent", path)

    @given(prefix=st.from_regex(r"(/[a-z0-9]{1,6}){1,3}/?", fullmatch=True),
           tail=st.from_regex(r"[a-z0-9/]{0,8}", fullmatch=True))
    @settings(max_examples=200)
    def test_plain_prefix_rules_match_startswith(self, prefix, tail):
        """Without wildcards, RFC 9309 matching degenerates to plain prefix
        match — rule_matches must agree with str.startswith exactly."""
        path = prefix + tail
        assert rule_matches(prefix, path)
        assert rule_matches(prefix, prefix)
        # a path that can't start with the prefix must not match
        assert rule_matches(prefix, "/zzz~" + path) is (
            ("/zzz~" + path).startswith(prefix))

    @given(stem=st.from_regex(r"/[a-z]{1,8}", fullmatch=True),
           ext=st.from_regex(r"[a-z]{1,4}", fullmatch=True),
           extra=st.from_regex(r"[a-z]{0,4}", fullmatch=True))
    @settings(max_examples=200)
    def test_anchored_wildcard(self, stem, ext, extra):
        """`/*.<ext>$` matches exactly paths ENDING in .<ext>."""
        rule = f"/*.{ext}$"
        assert rule_matches(rule, f"{stem}.{ext}")
        assert rule_matches(rule, f"{stem}.{ext}{extra}") is (extra == "")


class TestObjectStorePagination:
    """Keyset pagination is a pure-Python kernel of the store — sweep it:
    for ANY key set and ANY page size, concatenated pages == the full
    ascending-UTF-8 listing, pages never exceed max_keys, and the
    next-token is None exactly at exhaustion."""

    @given(keys=st.lists(
        st.from_regex(r"[a-zA-Z0-9._/é中-]{1,20}", fullmatch=True)
        .filter(lambda k: ".." not in k.split("/")
                and not k.endswith("/") and not k.startswith("/")
                and "//" not in k),
        min_size=0, max_size=25, unique=True),
        page=st.integers(1, 7))
    @settings(max_examples=60, deadline=None)
    def test_pages_reassemble_full_listing(self, tmp_path_factory, keys,
                                           page):
        import os
        from fess_ds_s3_spark.sources.object_store import FsObjectStore
        root = tmp_path_factory.mktemp("prop-store")
        store = FsObjectStore(str(root))
        written = []
        for k in keys:
            # dirs and files can collide when one key is a path prefix of
            # another ("a" vs "a/b") — skip the loser like a real fixture
            try:
                store.put_object("b", k, k.encode())
                written.append(k)
            except (OSError, NotADirectoryError, IsADirectoryError):
                pass
        got, after, rounds = [], "", 0
        while True:
            entries, nxt = store.list_objects("b", start_after=after,
                                              max_keys=page)
            assert len(entries) <= page
            got.extend(e["key"] for e in entries)
            rounds += 1
            assert rounds <= len(written) + 2  # termination
            if nxt is None:
                break
            after = nxt
        assert got == sorted(written, key=lambda k: k.encode("utf-8"))
