"""FSWrapper (reference S3FSWrapper surface over Hadoop FS) — exercised
against file:// paths; every scheme rides the same API."""

import pytest

from omigo_data_analytics_spark.sources.fsutils import FSWrapper


@pytest.fixture()
def fsw(spark):
    return FSWrapper(spark)


def test_exists_rw_listing_roundtrip(fsw, tmp_path):
    base = str(tmp_path / "fsw")
    fsw.create_dir(f"{base}/a/b")
    assert fsw.dir_exists(f"{base}/a/b")
    assert not fsw.file_exists(f"{base}/a/b")  # a dir is not a file
    fsw.write_text_file(f"{base}/a/x.txt", "hello fs")
    fsw.write_text_file(f"{base}/a/y.txt", "bye")
    assert fsw.file_exists(f"{base}/a/x.txt")
    assert fsw.is_file(f"{base}/a/x.txt") and fsw.is_directory(f"{base}/a")
    assert fsw.read_text_file(f"{base}/a/x.txt") == "hello fs"
    assert fsw.read_file_contents_as_text(f"{base}/a/x.txt") == "hello fs"
    assert fsw.ls(f"{base}/a") == ["b", "x.txt", "y.txt"]
    assert fsw.list_files(f"{base}/a") == ["x.txt", "y.txt"]
    assert fsw.list_dirs(f"{base}/a") == ["b"]
    assert fsw.list_files(f"{base}/a", filter_func=lambda n: n.startswith("x")) \
        == ["x.txt"]
    listing = fsw.get_directory_listing(f"{base}/a")
    # full URIs (scheme kept) that round-trip into any FSWrapper method
    assert len(listing) == 3 and all(p.startswith("file:") for p in listing)
    assert [p.rsplit("/", 1)[-1] for p in listing] == ["b", "x.txt", "y.txt"]
    x_uri = [p for p in listing if p.endswith("x.txt")][0]
    assert fsw.is_file(x_uri) and fsw.read_text_file(x_uri) == "hello fs"
    b_uri = [p for p in listing if p.endswith("/b")][0]
    assert fsw.is_directory(b_uri)
    assert fsw.get_parent_directory(f"{base}/a/x.txt") == f"{base}/a"
    assert fsw.get_last_modified_timestamp(f"{base}/a/x.txt") > 1_500_000_000


def test_delete_and_wait_variants(fsw, tmp_path):
    base = str(tmp_path / "fsw2")
    fsw.makedirs(f"{base}/d")
    fsw.write_text_file(f"{base}/d/f.txt", "x")
    # wait variants return immediately when the state already holds
    assert fsw.file_exists_with_wait(f"{base}/d/f.txt", wait_sec=0)
    assert fsw.dir_exists_with_wait(f"{base}/d", wait_sec=0)
    assert fsw.delete_file_with_wait(f"{base}/d/f.txt", wait_sec=0)
    assert fsw.file_not_exists_with_wait(f"{base}/d/f.txt", wait_sec=0)
    with pytest.raises(FileNotFoundError):
        fsw.delete_file(f"{base}/d/f.txt")
    assert fsw.delete_file(f"{base}/d/f.txt", ignore_if_missing=True) is False
    assert fsw.delete_dir_with_wait(f"{base}/d", wait_sec=0)
    assert fsw.dir_not_exists_with_wait(f"{base}/d", wait_sec=0)
    # missing-path behaviors
    assert fsw.get_directory_listing(f"{base}/nope",
                                     ignore_if_missing=True) == []
    with pytest.raises(FileNotFoundError):
        fsw.get_directory_listing(f"{base}/nope")
    with pytest.raises(FileNotFoundError):
        fsw.read_file_contents_as_text_with_wait(f"{base}/nope.txt",
                                                 wait_sec=0, attempts=0)


def test_copy_leaf_dir(fsw, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    fsw.create_dir(src)
    for i in range(3):
        fsw.write_text_file(f"{src}/f{i}.txt", f"c{i}")
    fsw.create_dir(f"{src}/sub")  # non-recursive: subdir not copied
    assert fsw.copy_leaf_dir(src, dst) == 3
    assert fsw.list_files(dst) == ["f0.txt", "f1.txt", "f2.txt"]
    assert fsw.read_text_file(f"{dst}/f1.txt") == "c1"
    assert not fsw.dir_exists(f"{dst}/sub")
