"""Dataset cursor/terminator parity (reference: Dataset_2.py:88-134) and the
on-disk layout convention."""

import numpy as np

from ultrasound_modeling_tpu.data import synthetic
from ultrasound_modeling_tpu.data.pipeline import Dataset, load_npy_pair


def test_raw_layout(tmp_path):
    path = str(tmp_path / "train.npy")
    synthetic.write_npy(path, n=3, height=32, width=16, n_disp=10)
    raw = np.load(path)
    assert raw.shape == (3, 1, 32, 16, 12)
    x, y = load_npy_pair(path)
    assert x.shape == (3, 32, 16, 10)  # label + bMode stripped
    assert y.shape == (3, 32, 16)
    assert y.max() > 0.9  # labels present


def test_cursor_terminator_semantics():
    ds = Dataset.synthetic(n_train=10, n_test=5, height=16, width=16, n_disp=4)
    seen = 0
    terms = 0
    for _ in range(3):  # 3 passes
        while True:
            x, y, term = ds.next_train(4)
            assert x.shape == (4, 16, 16, 4)
            seen += 1
            if term:
                terms += 1
                break
    # 10 samples / batch 4 -> terminator on the 3rd call of each pass
    assert terms == 3
    assert seen == 9


def test_short_final_batch_substitutes_tail():
    ds = Dataset.synthetic(n_train=10, n_test=5, height=16, width=16, n_disp=4)
    ds.next_train(8)            # cursor at 8
    x, y, term = ds.next_train(8)   # only 2 left -> tail window
    assert term
    assert x.shape[0] == 8
    np.testing.assert_allclose(np.asarray(x), np.asarray(ds.x_tr[-9:-1]))


def test_fix_freezes_cursor():
    ds = Dataset.synthetic(n_train=10, n_test=5, height=16, width=16, n_disp=4)
    x1, _, _ = ds.next_train(4, fix=True)
    x2, _, _ = ds.next_train(4, fix=True)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_prefetch_order_and_errors():
    from ultrasound_modeling_tpu.data.pipeline import prefetch
    out = list(prefetch(iter(range(7)), size=2))
    assert out == list(range(7))
    out2 = list(prefetch(range(3), size=2, place=lambda v: v * 10))
    assert out2 == [0, 10, 20]

    def bad():
        yield 1
        raise ValueError("boom")

    collected = []
    try:
        for v in prefetch(bad(), size=2):
            collected.append(v)
        raised = False
    except ValueError:
        raised = True
    assert raised and collected == [1]


def test_epoch_iterators():
    ds = Dataset.synthetic(n_train=9, n_test=5, height=16, width=16, n_disp=4)
    batches = list(ds.train_epoch(4))
    assert len(batches) == 3  # 2 full + 1 tail-substituted
    assert all(b[0].shape[0] == 4 for b in batches)
