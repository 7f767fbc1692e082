"""Offline tests for the Pre-Processing stage ports (data_prep)."""

import json
import math
import os

import numpy as np
import pytest

from multimodaldiscussiontransformer_tpu.data_prep import (
    images,
    labels,
    splits,
    text_export,
    trees,
)


def leaf(i, label="NA", parent="root", link="root"):
    return {
        "id": f"c{i}",
        "link_id": f"t3_{link}",
        "parent_id": f"t1_{parent}" if parent != "root" else f"t3_{link}",
        "body": f"comment {i}",
    }


def test_build_month_trees_joins_labels_and_parents():
    subs = [{"id": "root", "title": "post", "body": "NA"}]
    comments = [
        leaf(1, parent="root"),
        leaf(2, parent="c1"),
        # child arriving before its parent (second-pass path, ref 68-77)
        {"id": "c4", "link_id": "t3_root", "parent_id": "t1_c3", "body": "b"},
        {"id": "c3", "link_id": "t3_root", "parent_id": "t1_c1", "body": "a"},
    ]
    out = trees.build_month_trees(
        subs, comments, {"root": "Neutral", "c2": "DEG"}
    )
    assert len(out) == 1
    t = out[0]
    assert t["data"]["label"] == "Neutral"
    assert trees.count_size_of_tree(t) == 5
    assert trees.count_labels(t) == 2
    c1 = t["tree"][0]
    ids = {c["id"] for c in c1["tree"]}
    assert ids == {"c2", "c3"}
    c3 = next(c for c in c1["tree"] if c["id"] == "c3")
    assert [c["id"] for c in c3["tree"]] == ["c4"]


def make_deep_tree(depth, label="NA"):
    node = {"data": {"label": label, "id": f"d{depth}"}, "id": f"d{depth}", "tree": []}
    root = node
    for d in range(1, depth):
        child = {"data": {"label": "NA", "id": f"d{d}"}, "id": f"d{d}", "tree": []}
        node["tree"] = [child]
        node = child
    return root


def test_prune_depth_limit():
    """Unlabelled branches are cut below depth 7 (3-prune-trees.py:27-33)."""
    t = make_deep_tree(12)
    trees.trim_and_get_size(t)
    d = 0
    node = t
    while node["tree"]:
        node = node["tree"][0]
        d += 1
    assert d == 7


def test_prune_keeps_labelled_and_top2():
    root = {"data": {"label": "NA", "id": "r"}, "id": "r", "tree": []}
    # one labelled child, three unlabelled with different sizes
    lab = {"data": {"label": "DEG", "id": "l"}, "id": "l", "tree": []}
    small = {"data": {"label": "NA", "id": "s"}, "id": "s", "tree": []}
    mid = make_deep_tree(3)
    big = make_deep_tree(5)
    root["tree"] = [small, lab, mid, big]
    trees.trim_and_get_size(root)
    kept = [c["id"] for c in root["tree"]]
    # labelled kept (inf), top max(2, 1) = 2 children total by size
    assert "l" in kept
    assert len(kept) == 2
    assert "d5" in kept  # the biggest unlabelled subtree


def test_cad_majority_label():
    assert labels.cad_majority_label(["Neutral", "Neutral"]) == "Neutral"
    assert labels.cad_majority_label(["Neutral", "DEG"]) == "DEG"
    assert (
        labels.cad_majority_label(["IdentityDirectedAbuse"] * 2 + ["DEG"])
        == "IdentityDirectedAbuse"
    )


def test_explode_lti_ids():
    raw = "\n1. \tabc\n2. \tdef\n3. \tghi\n"
    assert labels.explode_lti_ids(raw) == ["abc", "def", "ghi"]


def test_parse_images_and_annotation():
    body = "look https://i.imgur.com/xyz.jpg and http://other.com/a.png"
    urls = images.parse_images(body)
    assert "https://i.imgur.com/xyz.jpg" in urls
    tree = {
        "id": "root",
        "data": {"id": "root", "body": body},
        "tree": [{"id": "c1", "data": {"id": "c1", "body": "no image"}, "tree": []}],
    }
    jobs = images.get_images("root", tree)
    assert len(jobs) == 1
    assert tree["images"] == ["images/root/root-0.png"]
    assert tree["tree"][0]["images"] == []


def test_resize_image():
    from PIL import Image

    img = Image.new("RGB", (512, 128))
    out = images.resize_image(img)
    assert max(out.size) == 256


def test_splits_and_text_export(tmp_path):
    lines = []
    for i in range(10):
        label = "DEG" if i % 3 == 0 else "Neutral"
        lines.append(
            {
                "id": f"r{i}",
                "images": [],
                "data": {"id": f"r{i}", "title": f"post {i}", "body": f"b{i}", "label": label},
                "tree": [
                    {
                        "id": f"r{i}c",
                        "data": {
                            "id": f"r{i}c", "link_id": f"t3_r{i}",
                            "body": "same copypasta" if i % 2 else f"unique {i}",
                            "label": "lti_normal",
                        },
                        "images": [],
                        "tree": [],
                    }
                ],
            }
        )
    path = tmp_path / "pruned-with-images.json"
    with open(path, "w") as f:
        for l in lines:
            f.write(json.dumps(l) + "\n")

    duped = splits.build_dupe_table(str(path), str(tmp_path / "duped.parquet"))
    assert "same copypasta" in duped

    made = splits.make_splits(str(path), str(tmp_path), n_splits=2, seed=0)
    assert len(made) == 2
    train0, test0 = made[0]
    assert len(set(train0) & set(test0)) == 0
    assert len(train0) + len(test0) == 10
    assert os.path.exists(tmp_path / "train-idx.txt")

    total = text_export.export_splits(
        str(path), str(tmp_path), str(tmp_path / "out"), duped=duped, n_splits=2
    )
    import pandas as pd

    df = pd.read_parquet(
        tmp_path / "out" / "HatefulDiscussions_dataset_train-split-0.parquet"
    )
    # duplicated copypasta comments excluded; labels binarized
    assert not df["text"].str.contains("copypasta").any()
    assert set(df["label"].unique()) <= {0, 1}
    assert total > 0


def test_gather_filter_month_dump(tmp_path):
    from multimodaldiscussiontransformer_tpu.data_prep import gather

    rs = tmp_path / "RS"
    rc = tmp_path / "RC"
    rs.write_text(
        '{"id":"abc","title":"t"}\n{"id":"zzz","title":"x"}\n'
    )
    rc.write_text(
        '{"id":"c1","link_id":"t3_abc"}\n{"id":"c2","link_id":"t3_zzz"}\n'
    )
    n_subs, n_comments = gather.filter_month_dump(
        str(rs), str(rc), ["abc"], str(tmp_path / "subs.json"), str(tmp_path / "com.json")
    )
    assert (n_subs, n_comments) == (1, 1)
    assert "abc" in (tmp_path / "subs.json").read_text()
    assert "zzz" not in (tmp_path / "com.json").read_text()
