"""Tests for the wbml-replacement utilities (metrics, experiment, data)."""

import os

import numpy as np

from gpar_tpu.utils.data import (
    chain_functions,
    load_air_temp,
    load_eeg,
    load_exchange,
    load_jura,
)
from gpar_tpu.utils.experiment import Counter, WorkingDirectory, kv
from gpar_tpu.utils.metrics import mae, mse, rmse, smse, smse_train_mean

from .util import approx

rng = np.random.default_rng(9)


def test_mse_mae_rmse():
    pred = np.array([[1.0, 2.0], [3.0, 4.0]])
    target = np.array([[1.5, 2.0], [2.5, 3.0]])
    approx(mse(pred, target), [0.25, 0.5])
    approx(mae(pred, target), [0.5, 0.5])
    approx(rmse(pred, target), np.sqrt([0.25, 0.5]))


def test_metrics_nan_aware():
    pred = np.array([[1.0], [2.0], [3.0]])
    target = np.array([[1.5], [np.nan], [2.5]])
    approx(mse(pred, target), [0.25])


def test_smse_perfect_and_mean_predictor():
    target = rng.normal(size=(50, 2))
    # Perfect prediction -> 0.
    approx(smse(target, target), [0.0, 0.0], atol=1e-12)
    # Predicting the test mean -> 1.
    mean_pred = np.broadcast_to(target.mean(axis=0), target.shape)
    approx(smse(mean_pred, target), [1.0, 1.0], atol=1e-12)


def test_smse_train_mean():
    target = rng.normal(size=(30, 1))
    train_mean = np.array([0.3])
    got = smse_train_mean(np.full_like(target, 0.3), target, train_mean)
    approx(got, [1.0], atol=1e-12)


def test_working_directory(tmp_path):
    wd = WorkingDirectory(str(tmp_path), "exp", seed=0)
    assert os.path.isdir(wd.path)
    wd.save({"a": 1}, "out.pickle")
    assert wd.load("out.pickle") == {"a": 1}
    p = wd.file("sub", "x.txt")
    assert os.path.isdir(os.path.dirname(p))


def test_counter(capsys):
    with Counter(name="T", total=2) as c:
        c.count()
        c.count()
    out = capsys.readouterr().out
    assert "T" in out and "2/2" in out


def test_kv(capsys):
    kv("metric", 1.23456)
    out = capsys.readouterr().out
    assert "metric" in out


def test_chain_functions():
    x = np.linspace(0, 1, 50)
    f, y = chain_functions(x, p=3, noise=0.1)
    assert f.shape == (50, 3) and y.shape == (50, 3)
    assert np.isfinite(f).all()


def test_load_eeg_structure():
    x, y_train, y_test, columns = load_eeg()
    assert len(columns) == 7
    assert y_train.shape == (len(x), 7)
    # Test entries are exactly the train-NaN entries of test columns.
    test_mask = ~np.isnan(y_test)
    assert test_mask.sum() == 300  # 3 columns x 100 rows
    assert np.isnan(y_train[test_mask]).all()


def test_load_exchange_structure():
    x, y_train, y_test, columns = load_exchange()
    assert len(columns) == 13
    assert y_train.shape[1] == 13
    held = ~np.isnan(y_test)
    assert held.any()
    assert np.isnan(y_train[held]).all()


def test_load_jura_structure():
    x_train, y_train, x_test, y_test, columns = load_jura()
    assert x_train.shape[1] == 2
    assert columns == ["Ni", "Zn", "Cd"]
    assert len(x_test) == 100
    # Cd missing at test locations in train, Ni/Zn observed.
    assert np.isnan(y_train[:, 2]).sum() == 100
    assert not np.isnan(y_train[:, 0]).any()


def test_load_air_temp_structure():
    x_all, x_train, y_train, tests = load_air_temp(size=0)
    assert y_train.shape[1] == 4
    assert len(tests) == 2
    for x_t, y_t in tests:
        assert len(x_t) > 0


# ---------------------------------------------------------------------------
# Real-file (data_dir) parsing branch, against committed CSV fixtures in the
# documented upstream column formats (VERDICT r1 task 5).  The recipe for
# reproducing the paper metrics on the true datasets is docs/real_data.md.
# ---------------------------------------------------------------------------

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_load_eeg_real_file():
    x, y_train, y_test, columns = load_eeg(data_dir=FIXTURES)
    # Fixture: time = i/100; y[:, c] = (c+1) + i/10 in header order
    # F3,F4,F5,F6,FZ,F1,F2 == the loader's column order.
    assert len(x) == 8
    approx(x, np.arange(8) / 100)
    approx(y_train[0, 0], 1.0)  # F3 row 0
    approx(y_train[1, 1], 2.1)  # F4 row 1
    # The blanked F5 cell parses to NaN (missing data flows through).
    assert np.isnan(y_train[2, 2])
    # Test split: held-out rows of F1/F2/FZ are NaN in train, real in test.
    test_mask = ~np.isnan(y_test)
    assert np.isnan(y_train[test_mask]).all()
    c_fz = columns.index("FZ")
    approx(y_test[7, c_fz], 5.7)  # FZ = col 5 of data -> value 5 + 7/10


def test_load_exchange_real_file():
    x, y_train, y_test, columns = load_exchange(data_dir=FIXTURES)
    assert len(x) == 10 and len(columns) == 13
    approx(x, 2007 + np.arange(10) / 10)
    # Column mapping: fixture value (c+1)*0.5 + i*0.01 under the
    # "/"->"_" header convention (CHF/XAU are never held out).
    for name, c in [("USD/CHF", 0), ("USD/XAU", 12)]:
        approx(y_train[0, columns.index(name)], (c + 1) * 0.5)
    # Held-out year-fraction windows moved train values into y_test.
    held = ~np.isnan(y_test)
    assert held.any()
    assert np.isnan(y_train[held]).all()


def test_load_jura_real_file():
    x_train, y_train, x_test, y_test, columns = load_jura(data_dir=FIXTURES)
    assert x_train.shape == (8, 2)
    approx(x_train[:, 0], np.arange(8) * 0.5)
    approx(x_train[3, 1], 2.0)
    # Ni/Zn/Cd columns mapped by name.
    approx(y_test[:, 0].min(), 20.0)  # Ni fixture values 20..27
    assert np.isnan(y_train[:, 2]).sum() == len(x_test)  # Cd held out
    assert not np.isnan(y_train[:, 0]).any()


def test_load_air_temp_real_file():
    x_all, x_train, y_train, tests = load_air_temp(data_dir=FIXTURES, size=0)
    assert len(x_all) == 12
    approx(x_all, np.arange(12) * 0.25)
    approx(y_train[0, 0], 10.0)  # Bra row 0
    assert len(tests) == 2
    # Held-out windows: final two days of outputs 2 (Chi) and 3 (Sot).
    for (x_t, y_t), c in zip(tests, [2, 3]):
        assert len(x_t) > 0
        assert np.isnan(y_train[np.isin(x_all, x_t), c]).all()
        held = ~np.isnan(y_t)
        assert held.any() and set(np.nonzero(held)[1]) == {c}


def test_loader_missing_file_warns_and_falls_back(tmp_path):
    import warnings

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        x, y_train, y_test, columns = load_eeg(data_dir=str(tmp_path))
    assert any("falling back" in str(w.message) for w in rec)
    assert len(x) == 256  # synthetic stand-in shape
