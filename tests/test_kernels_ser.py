"""SER/RE decode kernels vs reference semantics
(toddleocr/postprocess/vqa.py, utils/utility.py:126-142)."""

from paddleocr_spark.kernels.ser import (
    fold_to_b,
    load_bio_label_maps,
    re_dedup_by_tail,
    ser_majority_decode,
)


def test_bio_label_maps_layout():
    label2id, id2label = load_bio_label_maps()
    assert label2id["O"] == 0
    assert label2id["B-QUESTION"] == 1 and label2id["I-QUESTION"] == 2
    assert label2id["B-ANSWER"] == 3 and label2id["I-ANSWER"] == 4
    assert label2id["B-HEADER"] == 5 and label2id["I-HEADER"] == 6
    assert id2label[3] == "B-ANSWER"


def test_fold_to_b():
    assert [fold_to_b(i) for i in range(7)] == [0, 1, 1, 3, 3, 5, 5]


def test_ser_majority_decode_votes_and_ties():
    # segment 1: [B-Q, I-Q, B-A] -> folds [1,1,3] -> Q wins
    # segment 2: [B-A, I-A] -> A
    # segment 3: tie [B-Q, B-A] -> bincount argmax = smallest id = Q
    preds = [1, 2, 3, 3, 4, 1, 3]
    out = ser_majority_decode(preds, [3, 5, 7])
    assert out == [(1, "QUESTION"), (3, "ANSWER"), (1, "QUESTION")]


def test_ser_majority_decode_empty_and_o():
    out = ser_majority_decode([0, 0, 5], [2, 2, 3])
    assert out[0] == (0, "O")
    assert out[1] == (0, "O")      # empty segment -> 0 (vqa.py:137-138)
    assert out[2] == (5, "HEADER")


def test_re_dedup_first_head_per_tail():
    rels = [{"head_id": 0, "tail_id": 9}, {"head_id": 1, "tail_id": 9},
            {"head_id": 2, "tail_id": 5}]
    out = re_dedup_by_tail(rels)
    assert out == [{"head_id": 0, "tail_id": 9},
                   {"head_id": 2, "tail_id": 5}]


def test_split_bbox_proportional_units():
    """label_ops.py:987-999: char-width units, per-word advance of
    len+1 units, one bbox per subword token."""
    from paddleocr_spark.kernels.ser import split_bbox

    # "ab cde" over x:[0, 12]: 6 chars -> unit 2; "ab" -> [0,?,4,?],
    # advance 3 units = 6; "cde" -> [6,?,12,?]
    out = split_bbox([0, 1, 12, 5], "ab cde")
    assert out == [[0.0, 1.0, 4.0, 5.0], [6.0, 1.0, 12.0, 5.0]]
    # subword tokenizer repeats the word bbox per token
    out2 = split_bbox([0, 0, 12, 2], "ab cde",
                      tokenize=lambda w: list(w[:2]))
    assert len(out2) == 4 and out2[0] == out2[1]
    assert split_bbox([0, 0, 10, 2], "") == []
