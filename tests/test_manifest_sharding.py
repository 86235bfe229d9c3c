"""Sharded manifests (SCALE.md "Manifest metadata at scale"): the list
object stays the single put-if-absent commit arbiter while per-partition
part objects carry the per-file maps, loaded lazily by partition-pruned
scans — the Iceberg manifest-list design behind the Store seam."""

from __future__ import annotations

import json
import os

import pytest

from lakefs_iceberg_catalog_spark.catalog.catalog import VersionedCatalog
from lakefs_iceberg_catalog_spark.catalog.errors import (
    CommitConflictError,
    CommitStateError,
)
from lakefs_iceberg_catalog_spark.catalog.manifest import (
    METADATA_SHARD_PROP,
    TableManifest,
)
from lakefs_iceberg_catalog_spark.catalog import manifest as manifest_mod
from lakefs_iceberg_catalog_spark.catalog.store import LocalManifestStore


class CountingStore(LocalManifestStore):
    """Records every read path — the proof that pruned scans never touch
    non-matching shard parts."""

    def __init__(self):
        self.reads: list[str] = []

    def read(self, path):
        self.reads.append(os.path.basename(path))
        return super().read(path)


@pytest.fixture
def counting_store(monkeypatch):
    store = CountingStore()
    monkeypatch.setattr(manifest_mod, "_LOCAL_STORE", store)
    return store


@pytest.fixture
def shard_cat(spark, tmp_path):
    """Partitioned table (gender) with sharded metadata from creation."""
    c = VersionedCatalog(spark, str(tmp_path / "warehouse"))
    c.create_repository("repo", "main")
    c.create_namespace("repo.main.db")
    t = "repo.main.db.people"
    c.create_table(
        t,
        "id int, name string, age int, gender string",
        properties={METADATA_SHARD_PROP: "true"},
        partition_by=["gender"],
    )
    rows = [
        (1, "James", 32, "M"),
        (2, "Maria", 36, "F"),
        (3, "Robert", 41, "M"),
        (4, "Jen", 44, "F"),
        (5, "Monika", 31, "F"),
    ]
    c.append(t, spark.createDataFrame(rows, "id int, name string, age int, gender string"))
    return c, t


def _meta_dir(cat, t):
    ops, _ = cat._ops(t)
    return ops.meta_dir


def test_sharded_layout_on_disk(shard_cat):
    cat, t = shard_cat
    meta = _meta_dir(cat, t)
    names = sorted(os.listdir(meta))
    parts = [n for n in names if ".part" in n]
    assert parts, names
    d = json.loads(open(os.path.join(meta, "v2.manifest.json")).read())
    assert "shards" in d and d["files"] == [] and d["file_stats"] == {}
    # one shard per gender partition value
    pvals = {json.dumps(i["partition"]) for i in d["shards"].values()}
    assert pvals == {'{"gender": "F"}', '{"gender": "M"}'}
    # parts hold the per-file maps
    part = json.loads(open(os.path.join(meta, d["shards"]['{"gender": "F"}']["part"])).read())
    assert part["files"] and all(f in part["file_stats"] for f in part["files"])


def test_sharded_scan_and_history_roundtrip(shard_cat, spark):
    cat, t = shard_cat
    assert cat.scan(t).count() == 5
    assert {r["gender"] for r in cat.scan(t).collect()} == {"M", "F"}
    # another append -> next sharded version; time travel still works
    cat.append(t, spark.createDataFrame([(6, "Zoe", 28, "F")], "id int, name string, age int, gender string"))
    assert cat.scan(t).count() == 6
    assert cat.scan(t, version=2).count() == 5
    assert cat.table_history(t) == [1, 2, 3]
    assert cat.snapshots(t).count() == 3


def test_from_json_refuses_sharded_list(shard_cat):
    cat, t = shard_cat
    ops, _ = cat._ops(t)
    with pytest.raises(CommitStateError):
        TableManifest.from_json(ops.read_version(2))


def test_pruned_scan_skips_nonmatching_parts(spark, tmp_path, counting_store):
    cat = VersionedCatalog(spark, str(tmp_path / "w2"))
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    t = "repo.main.db.people"
    cat.create_table(
        t,
        "id int, name string, gender string",
        properties={METADATA_SHARD_PROP: "true"},
        partition_by=["gender"],
    )
    cat.append(
        t,
        spark.createDataFrame(
            [(1, "James", "M"), (2, "Maria", "F"), (3, "Robert", "M")],
            "id int, name string, gender string",
        ),
    )
    ops, _ = cat._ops(t)
    d = ops.peek_version(2)
    f_part = d["shards"]['{"gender": "F"}']["part"]
    m_part = d["shards"]['{"gender": "M"}']["part"]

    counting_store.reads.clear()
    rows = cat.scan_pruned(t, "gender", "=", "F").collect()
    assert [r["name"] for r in rows] == ["Maria"]
    assert f_part in counting_store.reads
    assert m_part not in counting_store.reads  # the lazy-load proof

    # select_files agrees and reports the TRUE total from the shard index
    keep, total = cat.select_files(t, "gender", "=", "F")
    assert total == 2 and len(keep) == 1


def test_commit_race_cleans_loser_parts(shard_cat, monkeypatch):
    """A loser of the put-if-absent race (stale-base check passed, another
    writer landed the list object in between) must delete its own freshly
    written part objects — they are unreferenced orphans."""
    cat, t = shard_cat
    ops, _ = cat._ops(t)
    base = ops.current()
    loser = base.next(base.files)
    before = {n for n in os.listdir(ops.meta_dir) if ".part" in n}

    def lose(path, content):
        raise FileExistsError(path)

    monkeypatch.setattr(ops.store, "put_if_absent", lose)
    with pytest.raises(CommitConflictError):
        ops.commit(base, loser)
    after = {n for n in os.listdir(ops.meta_dir) if ".part" in n}
    assert after == before  # the loser's parts were deleted


def test_dml_on_sharded_table(shard_cat, spark):
    cat, t = shard_cat
    cat.delete_where(t, "age > 40")
    assert sorted(r["id"] for r in cat.scan(t).collect()) == [1, 2, 5]
    cat.update_where(t, "gender = 'M'", {"age": "age + 1"})
    assert {r["id"]: r["age"] for r in cat.scan(t).collect()}[1] == 33


def test_expire_removes_version_parts(shard_cat, spark):
    cat, t = shard_cat
    cat.append(t, spark.createDataFrame([(9, "Ann", 20, "F")], "id int, name string, age int, gender string"))
    ops, _ = cat._ops(t)
    v2_parts = {n for n in os.listdir(ops.meta_dir) if n.startswith("v2-")}
    assert v2_parts
    expired = cat.expire_versions(t, keep_last=1)
    assert 2 in expired
    left = set(os.listdir(ops.meta_dir))
    assert not (v2_parts & left)
    assert cat.scan(t).count() == 6  # head still reads


def test_unsharded_to_sharded_transition(spark, tmp_path):
    """Turning the property on mid-life shards from the NEXT commit on; the
    mixed chain stays fully readable (each version self-describes)."""
    cat = VersionedCatalog(spark, str(tmp_path / "w3"))
    cat.create_repository("repo", "main")
    cat.create_namespace("repo.main.db")
    t = "repo.main.db.ev"
    cat.create_table(t, "id int, k string", partition_by=["k"])
    cat.append(t, spark.createDataFrame([(1, "a"), (2, "b")], "id int, k string"))
    cat.set_table_properties(t, {METADATA_SHARD_PROP: "true"})
    cat.append(t, spark.createDataFrame([(3, "a")], "id int, k string"))
    ops, _ = cat._ops(t)
    assert "shards" not in ops.peek_version(2)
    assert "shards" in ops.peek_version(4)
    assert cat.scan(t).count() == 3
    assert cat.scan(t, version=2).count() == 2
