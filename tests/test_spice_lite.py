"""SPICE(lite) — the jar-less scene-graph metric (evalcap/spice_lite.py).

Covers the rule-based parser on caption-register constructions, the
P/R/F protocol (identical to the jar's, reference spice.py:85-101), the
category breakdowns, and the eval-driver fallback labeling.
"""
import numpy as np
import pytest

from simpleimagecaptionzoo_tpu.evalcap.spice_lite import (SpiceLite,
                                                          parse_scene_graph)


def test_parser_objects_attributes_relation():
    t = parse_scene_graph("a big purple triangle above a small red circle")
    assert ("triangl",) in t and ("circl",) in t
    assert ("triangl", "big") in t and ("triangl", "purpl") in t
    assert ("circl", "small") in t and ("circl", "red") in t
    assert ("triangl", "abov", "circl") in t
    assert len(t) == 7


def test_parser_gerund_and_nearest_left_attachment():
    t = parse_scene_graph("a man riding a horse on a beach")
    assert ("man", "ride", "hors") in t
    # documented approximation: PPs attach to the nearest LEFT noun
    assert ("hors", "on", "beach") in t


def test_parser_copula_complement_is_attribute():
    t = parse_scene_graph("the car is red")
    assert t == {("car",), ("car", "red")}


def test_parser_trailing_verb_becomes_attribute():
    t = parse_scene_graph("a dog is running")
    assert t == {("dog",), ("dog", "run")}


def test_parser_counts_and_verb_prep_merge():
    t = parse_scene_graph("two dogs are playing with a ball")
    assert ("dog", "2") in t
    assert ("dog", "play with", "ball") in t


def test_parser_noun_ing_not_a_verb():
    t = parse_scene_graph("a dining table with a painting on the wall")
    assert ("tabl", "dine") in t            # "dining" modifies, not predicates
    assert ("tabl", "with", "paint") in t


def test_parser_coordination_inside_and_between_nps():
    t = parse_scene_graph("a black and white cat and a brown dog")
    assert ("cat", "black") in t and ("cat", "white") in t
    assert ("dog", "brown") in t and ("dog",) in t


def test_parser_postnominal_participle():
    t = parse_scene_graph("a car parked on the street")
    assert ("car", "park on", "street") in t
    assert ("park",) not in t and ("parked",) not in t


def test_parser_multiword_preposition():
    t = parse_scene_graph("a young boy in front of the building")
    assert ("boy", "in front of", "build") in t


def test_identical_captions_score_one():
    s = SpiceLite()
    gts = {1: ["a man riding a horse on a beach"]}
    res = {1: ["a man riding a horse on a beach"]}
    score, per = s.compute_score(gts, res)
    assert score == pytest.approx(1.0)
    assert per[0]["All"] == {"p": 1.0, "r": 1.0, "f": 1.0}


def test_disjoint_captions_score_zero():
    s = SpiceLite()
    score, per = s.compute_score({1: ["a red car"]}, {1: ["a blue boat"]})
    assert score == 0.0
    assert per[0]["All"]["f"] == 0.0


def test_morphology_matches_across_captions():
    """Stemming must align rides/riding and horse/horses."""
    s = SpiceLite()
    score, _ = s.compute_score({1: ["a man rides a horse"]},
                               {1: ["a man riding a horse"]})
    assert score == pytest.approx(1.0)


def test_reference_union_and_prf_arithmetic():
    s = SpiceLite()
    gts = {1: ["a red car", "a car on a road"]}
    res = {1: ["a red car on a road"]}
    score, per = s.compute_score(gts, res)
    # cand = {(car,), (car,red), (car,on,road), (road,)} and the ref UNION
    # is the same 4 tuples -> perfect match
    assert score == pytest.approx(1.0)
    # a candidate missing the relation scores r=3/4 against that union
    score2, per2 = s.compute_score(gts, {1: ["a red car"]})
    assert per2[0]["All"]["p"] == pytest.approx(1.0)
    assert per2[0]["All"]["r"] == pytest.approx(0.5)  # 2 of 4 ref tuples


def test_category_breakdowns():
    s = SpiceLite()
    gts = {1: ["two big red cars on a road"]}
    res = {1: ["two big red cars on a road"]}
    _, per = s.compute_score(gts, res)
    cats = per[0]
    for cat in ("All", "Object", "Attribute", "Relation",
                "Color", "Count", "Size"):
        assert cat in cats
    assert cats["Color"]["f"] == 1.0     # red
    assert cats["Size"]["f"] == 1.0      # big
    assert cats["Count"]["f"] == 1.0     # two
    assert cats["Relation"]["f"] == 1.0  # (car, on, road)


def test_multi_candidate_union():
    """AllSPICE semantics: several candidate captions contribute the union
    of their graphs."""
    s = SpiceLite()
    gts = {1: ["a man riding a horse on a beach"]}
    solo, _ = s.compute_score(gts, {1: ["a man riding a horse"]})
    merged, _ = s.compute_score(
        gts, {1: ["a man riding a horse", "a horse on a beach"]})
    assert merged > solo


def test_corpus_mean_over_images():
    s = SpiceLite()
    gts = {1: ["a red car"], 2: ["a blue boat"]}
    res = {1: ["a red car"], 2: ["a green plane"]}
    score, per = s.compute_score(gts, res)
    assert score == pytest.approx(
        np.mean([p["All"]["f"] for p in per]))
    assert per[0]["All"]["f"] == 1.0 and per[1]["All"]["f"] < 0.5


def test_coco_eval_driver_uses_lite_label(tmp_path, monkeypatch):
    """Jar-less CocoEvalCap must publish SPICE(lite), never SPICE."""
    from simpleimagecaptionzoo_tpu.evalcap.coco_eval import CocoEvalCap
    from simpleimagecaptionzoo_tpu.evalcap.spice import Spice
    if Spice().available:  # pragma: no cover - jar-enabled envs
        pytest.skip("jar present; fallback path not reachable")
    gts = {1: [{"caption": "a man rides a horse"}]}
    res = {1: [{"caption": "a man riding a horse"}]}
    ev = CocoEvalCap(gts, res)
    ev.evaluate()
    assert "SPICE(lite)" in ev.eval
    assert "SPICE" not in ev.eval
    assert 0.0 <= ev.eval["SPICE(lite)"] <= 1.0
    # per-image dict scores must not leak into evalImgs float fields
    assert all(not k.startswith("SPICE") for e in ev.evalImgs
               for k in e if k != "image_id")
