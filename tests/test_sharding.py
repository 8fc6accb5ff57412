"""Rendezvous fetcher-shard assignment: the structural properties the
DuckDB twin cannot state (test_queries_oracle covers value equality).

Minimal movement is rendezvous hashing's defining contract: growing the
fleet K → K+1 moves a host ONLY when the new shard wins its rendezvous,
so every mover lands on shard K and survivors never reshuffle between
old shards. A modulo assignment (host_hash % K) would move ~K/(K+1) of
hosts; rendezvous moves an expected 1/(K+1).
"""

from __future__ import annotations

from ccspark.sharding import N_SHARDS, _hosts, assign_shards


def test_rebalance_movers_land_on_new_shard_only(spark, sf_dir):
    hosts = _hosts(spark, sf_dir)
    n_hosts = hosts.count()
    old = assign_shards(hosts, N_SHARDS, "shard_old")
    new = assign_shards(hosts, N_SHARDS + 1, "shard_new")
    rows = old.join(new, "host").collect()
    assert len(rows) == n_hosts
    moved = [r for r in rows if r.shard_old != r.shard_new]
    # every mover lands on the NEW shard — no old→old reshuffling
    assert all(r.shard_new == N_SHARDS for r in moved)
    # expected moved fraction 1/(K+1) ≈ 5.9% of 160 hosts ≈ 9.4; allow
    # a wide deterministic band (the fixture is fixed, so this is a
    # regression pin, not a statistical test)
    assert 1 <= len(moved) <= 3 * (len(rows) // (N_SHARDS + 1) + 1)
    # survivors keep their exact shard id
    for r in rows:
        if r.shard_new != N_SHARDS:
            assert r.shard_old == r.shard_new


def test_assignment_total_and_in_range(spark, sf_dir):
    a = assign_shards(_hosts(spark, sf_dir), N_SHARDS).collect()
    assert len(a) == len({r.host for r in a})  # one shard per host
    assert all(0 <= r.shard < N_SHARDS for r in a)
    # uniformity sanity: every shard gets at least one of the 160 hosts
    assert len({r.shard for r in a}) == N_SHARDS
