"""File-format parser tests on synthetic on-disk trees (CUB txt pairs, SOP
Ebay txt, InShop partition, VOC XML, MIRFlickr manifests) — the reference
never tested its loaders (SURVEY §4 'Dataset code is untested')."""

import os

import numpy as np
import pytest
from PIL import Image


def _touch_image(path, size=(8, 8)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, (120, 30, 200)).save(path)


def test_cub200_split(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "images.txt"), "w") as f:
        f.write("1 001.ClassA/a.jpg\n2 101.ClassB/b.jpg\n3 001.ClassA/c.jpg\n")
    with open(os.path.join(root, "image_class_labels.txt"), "w") as f:
        f.write("1 1\n2 101\n3 1\n")
    for rel in ("001.ClassA/a.jpg", "101.ClassB/b.jpg", "001.ClassA/c.jpg"):
        _touch_image(os.path.join(root, "images", rel))

    from irw_tpu.data.datasets_image import Cub200Dataset

    train = Cub200Dataset(root, mode="train")
    test = Cub200Dataset(root, mode="test")
    assert len(train) == 2 and len(test) == 1  # classes 1-100 / 101-200
    assert train[0]["image"].size == (8, 8)


def test_sop_parser(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "Ebay_train.txt"), "w") as f:
        f.write("image_id class_id super_class_id path\n")
        f.write("1 1 1 bicycle/a.jpg\n2 2 1 bicycle/b.jpg\n3 3 2 chair/c.jpg\n")
    for rel in ("bicycle/a.jpg", "bicycle/b.jpg", "chair/c.jpg"):
        _touch_image(os.path.join(root, rel))

    from irw_tpu.data.datasets_image import SOPDataset

    ds = SOPDataset(root, mode="train")
    assert len(ds) == 3
    assert set(np.asarray(ds.super_labels).tolist()) == {0, 1}


def test_inshop_partition(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "list_eval_partition.txt"), "w") as f:
        f.write("3\nimage_name item_id evaluation_status\n")
        f.write("img/a.jpg id_00000001 train\n")
        f.write("img/b.jpg id_00000001 query\n")
        f.write("img/c.jpg id_00000001 gallery\n")
    for rel in ("img/a.jpg", "img/b.jpg", "img/c.jpg"):
        _touch_image(os.path.join(root, rel))

    from irw_tpu.data.datasets_image import InShopDataset

    assert len(InShopDataset(root, mode="train")) == 1
    assert len(InShopDataset(root, mode="query")) == 1
    assert len(InShopDataset(root, mode="gallery")) == 1


def test_voc_xml_parser(tmp_path):
    root = os.path.join(str(tmp_path), "VOC2012")
    os.makedirs(os.path.join(root, "ImageSets", "Main"))
    os.makedirs(os.path.join(root, "Annotations"))
    with open(os.path.join(root, "ImageSets", "Main", "train.txt"), "w") as f:
        f.write("img001\nimg002\n")
    with open(os.path.join(root, "ImageSets", "Main", "val.txt"), "w") as f:
        f.write("img003\n")
    ann = """<annotation><object><name>dog</name></object>
             <object><name>person</name></object></annotation>"""
    for img_id, body in (("img001", ann), ("img002", ann.replace("dog", "cat")),
                         ("img003", ann)):
        with open(os.path.join(root, "Annotations", f"{img_id}.xml"), "w") as f:
            f.write(body)
        _touch_image(os.path.join(root, "JPEGImages", f"{img_id}.jpg"))

    from irw_tpu.data.datasets_multilabel import VOC_CLASSES, VOC2012Hashing

    gallery = VOC2012Hashing(str(tmp_path), mode="gallery")
    query = VOC2012Hashing(str(tmp_path), mode="query")
    assert len(gallery) == 2 and len(query) == 1  # train=database, val=query
    assert gallery.labels.shape == (2, 20)
    dog, person = VOC_CLASSES.index("dog"), VOC_CLASSES.index("person")
    assert gallery.labels[0, dog] == 1.0 and gallery.labels[0, person] == 1.0
    assert gallery.labels[1, dog] == 0.0  # cat instead


def test_mirflickr_manifest(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "train_img.txt"), "w") as f:
        f.write("im1.jpg\nim2.jpg\n")
    with open(os.path.join(root, "train_label.txt"), "w") as f:
        f.write("1 0 1\n0 1 0\n")
    for rel in ("im1.jpg", "im2.jpg"):
        _touch_image(os.path.join(root, rel))

    from irw_tpu.data.datasets_multilabel import MIRFlickrHashing

    ds = MIRFlickrHashing(root, mode="train")
    assert len(ds) == 2 and ds.labels.shape == (2, 3)
    np.testing.assert_array_equal(ds.labels[0], [1, 0, 1])


def test_corrupt_image_fallback(tmp_path):
    """flikr_coco.py:53-56 black-image tolerance."""
    root = str(tmp_path)
    bad = os.path.join(root, "bad.jpg")
    os.makedirs(root, exist_ok=True)
    with open(bad, "w") as f:
        f.write("not an image")

    from irw_tpu.data.base import BaseDataset

    ds = BaseDataset([bad], np.array([0]))
    img = ds.load_image(0)
    assert img.size == (256, 256)  # black fallback, no crash


def test_image_folder_dataset(tmp_path):
    root = str(tmp_path)
    for cls, n in (("ants", 4), ("bees", 3), ("cats", 5), ("dogs", 2)):
        for j in range(n):
            _touch_image(os.path.join(root, cls, f"{j}.jpg"))
    open(os.path.join(root, "notes.txt"), "w").write("ignored")

    from irw_tpu.data.datasets_image import ImageFolderDataset

    everything = ImageFolderDataset(root, mode="all")
    assert len(everything) == 14 and sorted(set(everything.labels)) == [0, 1, 2, 3]

    train = ImageFolderDataset(root, mode="train")   # class-disjoint halves
    test = ImageFolderDataset(root, mode="test")
    assert len(train) == 7 and len(test) == 7        # ants+bees | cats+dogs
    assert set(train.labels) == {0, 1} and set(test.labels) == {0, 1}  # remapped

    tr = ImageFolderDataset(root, mode="train", split="in_domain", holdout=0.5)
    te = ImageFolderDataset(root, mode="test", split="in_domain", holdout=0.5)
    assert len(tr) + len(te) == 14
    assert set(tr.paths).isdisjoint(te.paths)
    assert tr[0]["image"].size == (8, 8)

    # registry + getter path
    from irw_tpu.data import DATASET_REGISTRY
    assert "ImageFolderDataset" in DATASET_REGISTRY


def test_nuswide_dsch_manifest(tmp_path):
    """NUS-WIDE in the DSCH layout (_data.py:44-61): single-file manifests
    train/query/dbase.txt of ``<file> <l0> ... <l20>``, images under
    ``images/``; 21 classes; gallery mode resolves the ``dbase`` stem."""
    root = str(tmp_path)
    lab_a = "1 " + "0 " * 19 + "1"
    lab_b = "0 1 " + "0 " * 18 + "1"
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write(f"im1.jpg {lab_a}\nim2.jpg {lab_b}\n")
    with open(os.path.join(root, "query.txt"), "w") as f:
        f.write(f"im1.jpg {lab_a}\n")
    with open(os.path.join(root, "dbase.txt"), "w") as f:
        f.write(f"im1.jpg {lab_a}\nim2.jpg {lab_b}\n")
    for rel in ("im1.jpg", "im2.jpg"):
        _touch_image(os.path.join(root, "images", rel))

    from irw_tpu.data.datasets_multilabel import NUSWIDEHashing

    train = NUSWIDEHashing(root, mode="train")
    query = NUSWIDEHashing(root, mode="query")
    gallery = NUSWIDEHashing(root, mode="gallery")
    assert NUSWIDEHashing.num_classes == 21
    assert train.labels.shape == (2, 21)
    assert len(query) == 1 and len(gallery) == 2
    np.testing.assert_array_equal(train.labels[0, [0, 20]], [1, 1])
    assert train[0]["image"].size == (8, 8)

    from irw_tpu.data.registry import DATASET_REGISTRY, QUERY_GALLERY_DATASETS

    assert "NUSWIDEHashing" in DATASET_REGISTRY
    assert "NUSWIDEHashing" in QUERY_GALLERY_DATASETS
