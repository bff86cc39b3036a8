"""Real-data readiness: fabricated on-disk fixtures in the reference's
NATIVE layouts (ImageFolder JPEG trees, CASIA identity folders, the official
LFW pairs.txt) must round-trip through the loaders."""

import os

import numpy as np
import pytest
from PIL import Image

from cpg_tpu.data.face import (casia_task, eval_pairs, load_lfw_pairs,
                               parse_lfw_pairs)
from cpg_tpu.data.finegrained import finegrained_task
from cpg_tpu.data.imagefolder import (decode_image, imagefolder_splits,
                                      load_imagefolder)


def _write_img(path, seed, hw=(40, 40)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (*hw, 3), dtype=np.uint8)).save(path)


def _make_imagefolder(root, classes=("cardinal", "wren"), n=3, hw=(40, 40)):
    for split in ("train", "test"):
        for ci, c in enumerate(classes):
            for i in range(n):
                _write_img(os.path.join(root, split, c, f"img_{i}.jpg"),
                           seed=ci * 100 + i, hw=hw)


def test_load_imagefolder_layout(tmp_path):
    root = str(tmp_path / "cubs")
    _make_imagefolder(root)
    x, y, classes = load_imagefolder(os.path.join(root, "train"),
                                     hw=(32, 32), resize=36)
    assert x.shape == (6, 32, 32, 3) and x.dtype == np.uint8
    assert classes == ["cardinal", "wren"]  # sorted-folder rule
    np.testing.assert_array_equal(np.unique(y), [0, 1])

    fold = imagefolder_splits(root, hw=(32, 32), resize=36)
    assert fold["num_classes"] == 2
    assert fold["test_x"].shape == (6, 32, 32, 3)


def test_finegrained_task_eats_imagefolder(tmp_path, monkeypatch):
    _make_imagefolder(str(tmp_path / "cubs_cropped"), hw=(240, 240))
    monkeypatch.setenv("CPG_DATA_DIR", str(tmp_path))
    t = finegrained_task("cubs_cropped")
    assert t["train_x"].shape == (6, 224, 224, 3)
    assert t["num_classes"] == 2


def test_casia_identity_folders(tmp_path, monkeypatch):
    for pi, person in enumerate(["ada", "bob", "cyd"]):
        for i in range(3):
            _write_img(str(tmp_path / "casia" / person / f"{i}.jpg"),
                       seed=pi * 10 + i, hw=(112, 96))
    monkeypatch.setenv("CPG_DATA_DIR", str(tmp_path))
    t = casia_task()
    assert t["num_classes"] == 3
    assert t["train_x"].shape[1:] == (112, 96, 3)
    assert len(t["train_x"]) + len(t["test_x"]) == 9


def test_lfw_pairs_protocol(tmp_path):
    # canonical pairs.txt: header "2\t2", per fold 2 same + 2 diff lines
    people = {"Ada_Lovelace": 3, "Bob_Noyce": 2, "Cyd_Charisse": 2,
              "Don_Knuth": 2}
    for pi, (name, n) in enumerate(people.items()):
        proto = np.random.RandomState(pi).randint(0, 200, (112, 96, 3))
        for i in range(1, n + 1):
            jit = np.random.RandomState(pi * 10 + i).randint(0, 55,
                                                             (112, 96, 3))
            img = np.clip(proto + jit, 0, 255)
            # symmetrize: eval_pairs embeds the horizontal flip too
            img = ((img + img[:, ::-1]) // 2).astype(np.uint8)
            p = tmp_path / name / f"{name}_{i:04d}.jpg"
            os.makedirs(p.parent, exist_ok=True)
            Image.fromarray(img).save(str(p))
    lines = ["2\t2",
             "Ada_Lovelace\t1\t2", "Bob_Noyce\t1\t2",
             "Ada_Lovelace\t1\tBob_Noyce\t1", "Cyd_Charisse\t1\tDon_Knuth\t1",
             "Cyd_Charisse\t1\t2", "Don_Knuth\t1\t2",
             "Ada_Lovelace\t2\tCyd_Charisse\t2", "Bob_Noyce\t2\tDon_Knuth\t2"]
    (tmp_path / "pairs.txt").write_text("\n".join(lines))

    pairs = parse_lfw_pairs(str(tmp_path / "pairs.txt"))
    assert len(pairs) == 8
    assert [s for _, _, s in pairs] == [1, 1, 0, 0, 1, 1, 0, 0]
    assert pairs[0] == (os.path.join("Ada_Lovelace", "Ada_Lovelace_0001.jpg"),
                        os.path.join("Ada_Lovelace", "Ada_Lovelace_0002.jpg"),
                        1)

    x, i1, i2, same = load_lfw_pairs(str(tmp_path))
    assert x.shape[1:] == (112, 96, 3) and len(i1) == 8

    # nearest-prototype one-hot embedding: same pairs -> cos 1, diff -> 0;
    # exercises the full fold protocol (threshold selection + held-out eval)
    # deterministically
    protos = np.stack([np.random.RandomState(pi).randint(0, 200,
                                                         (112, 96, 3))
                       for pi in range(len(people))]).astype(np.float32)
    protos = ((protos + protos[:, :, ::-1]) / 2).reshape(len(people), -1)

    def embed(b):
        b = np.asarray(b, np.float32).reshape(len(b), -1)
        d = ((b[:, None, :] - protos[None]) ** 2).sum(-1)
        return np.eye(len(people), dtype=np.float32)[d.argmin(1)]

    acc, std = eval_pairs(embed, x, i1, i2, same, batch_size=4, n_folds=2)
    assert acc == 1.0


def test_pairs_txt_malformed_raises(tmp_path):
    (tmp_path / "pairs.txt").write_text("2\t2\nAda\t1\t2")
    with pytest.raises(ValueError):
        parse_lfw_pairs(str(tmp_path / "pairs.txt"))


def test_decode_image_resize_and_crop(tmp_path):
    p = str(tmp_path / "img.png")
    _write_img(p, seed=0, hw=(60, 80))
    a = decode_image(p, (32, 32), resize=36)  # short side 60 -> 36, crop 32
    assert a.shape == (32, 32, 3)
    b = decode_image(p, (16, 24), resize=None)  # direct resize
    assert b.shape == (16, 24, 3)


def _fake_lfw_tree(root):
    people = {"Ada_Lovelace": 3, "Bob_Noyce": 2, "Cyd_Charisse": 2,
              "Don_Knuth": 2}
    for pi, (name, n) in enumerate(people.items()):
        proto = np.random.RandomState(pi).randint(0, 200, (112, 96, 3))
        for i in range(1, n + 1):
            jit = np.random.RandomState(pi * 10 + i).randint(0, 55,
                                                             (112, 96, 3))
            img = np.clip(proto + jit, 0, 255).astype(np.uint8)
            p = root / name / f"{name}_{i:04d}.jpg"
            os.makedirs(p.parent, exist_ok=True)
            Image.fromarray(img).save(str(p))
    lines = ["2\t2",
             "Ada_Lovelace\t1\t2", "Bob_Noyce\t1\t2",
             "Ada_Lovelace\t1\tBob_Noyce\t1", "Cyd_Charisse\t1\tDon_Knuth\t1",
             "Cyd_Charisse\t1\t2", "Don_Knuth\t1\t2",
             "Ada_Lovelace\t2\tCyd_Charisse\t2", "Bob_Noyce\t2\tDon_Knuth\t2"]
    (root / "pairs.txt").write_text("\n".join(lines))


def test_cli_face_evaluates_real_lfw(tmp_path, monkeypatch):
    """When $CPG_DATA_DIR/lfw/pairs.txt exists, the face CLI must evaluate
    the REAL pairs protocol, not the synthetic stand-in (VERDICT r2 #5)."""
    import contextlib
    import io
    import json

    from cpg_tpu.cli import main as cli_main

    _fake_lfw_tree(tmp_path / "lfw")
    monkeypatch.setenv("CPG_DATA_DIR", str(tmp_path))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main([
            "sequence", "--experiment", "face", "--num-tasks", "1",
            "--batch-size", "32", "--lr", "0.01", "--dtype", "float32",
            "--finetune-epochs", "1", "--prune-epochs", "1",
            "--retrain-epochs", "1", "--prune-ratios", "0.1",
        ])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    lv = summary["lfw_verification"]
    assert lv["source"] == "lfw" and lv["n_pairs"] == 8
    assert 0.0 <= lv["acc"] <= 1.0


def _make_textfolder(root, classes=("neg", "pos"), n=3, split_texts=None):
    import os

    for split in ("train", "test"):
        for c in classes:
            d = os.path.join(root, split, c)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                body = (split_texts or {}).get((split, c),
                                               f"{c} document {i} words")
                with open(os.path.join(d, f"{i}.txt"), "w") as f:
                    f.write(body)


def test_textfolder_byte_tokenizer(tmp_path):
    """root/{train,test}/<class>/*.txt -> static int32 (N, T): BOS prefix,
    UTF-8 bytes + 2, zero padding, sorted-folder class rule."""
    from cpg_tpu.data.textfolder import BOS, textfolder_task

    root = str(tmp_path / "sst")
    _make_textfolder(root)
    d = textfolder_task(root, seq_len=16, tokenizer="byte")
    assert d["num_classes"] == 2 and d["vocab"] == 258
    assert d["classes"] == ["neg", "pos"]
    assert d["train_x"].shape == (6, 16) and d["train_x"].dtype == np.int32
    row = d["train_x"][0]
    assert row[0] == BOS
    want = np.frombuffer(b"neg document 0", np.uint8).astype(np.int32) + 2
    np.testing.assert_array_equal(row[1:1 + len(want)], want)
    assert set(d["train_y"]) == {0, 1}


def test_textfolder_hash_tokenizer_stable(tmp_path):
    """Hashing-trick ids are process-stable (blake2b, not seeded hash()),
    case-folded, land in [2, vocab), and identical words share ids."""
    from cpg_tpu.data.textfolder import tokenize_hash

    a = tokenize_hash("The quick Fox", 8, vocab=512)
    b = tokenize_hash("the QUICK fox", 8, vocab=512)
    np.testing.assert_array_equal(a, b)
    assert a[0] == 1 and np.all(a[1:4] >= 2) and np.all(a < 512)
    assert a[4] == 0  # padding
    # documented stability anchor: a pinned literal (blake2b('the')
    # digest_size=8, little-endian, % 510, +2). Changing the hash scheme
    # breaks every saved checkpoint trained on hash-tokenized data — this
    # constant is the tripwire (ADVICE r3 #4: the old self-comparison was
    # a tautology).
    assert int(tokenize_hash("the", 2, vocab=512)[1]) == 482


def test_textcls_experiment_prefers_real_textfolder(tmp_path, monkeypatch):
    """CLI --experiment textcls eats $CPG_DATA_DIR/textcls/<task>/... when
    present and sizes the state's embedding from the tokenizer's vocab."""
    _make_textfolder(str(tmp_path / "textcls" / "t1_reviews"))
    _make_textfolder(str(tmp_path / "textcls" / "t2_topics"),
                     classes=("a", "b", "c"))
    monkeypatch.setenv("CPG_DATA_DIR", str(tmp_path))
    from cpg_tpu.data.textfolder import textfolder_task_splits

    tasks = textfolder_task_splits(seq_len=24)
    assert list(tasks) == ["t1_reviews", "t2_topics"]
    assert tasks["t2_topics"]["num_classes"] == 3
    assert all(t["train_x"].shape[1] == 24 for t in tasks.values())
    assert all(t["vocab"] == 258 for t in tasks.values())
