"""Fixtures deliberately derived from the reference test suite.

This module is the single home for test data that intentionally encodes
the SAME numbers as ``/root/reference/tests/test_model.py`` — oracle
fixtures that pin a behavioural contract can't avoid sharing the
contract's constants.  Everything here is attributed to its source line;
independently designed fixtures live in the test files themselves
(``tests/test_model.py::test_per_output_independent_pattern`` etc.).
"""

import numpy as np

#: The 6x4 NaN routing pattern of ``/root/reference/tests/test_model.py``
#: (``test_per_output``): exercises cumulative row filtering, an
#: all-missing tail output, and the keep=True widening.
PER_OUTPUT_Y_6X4 = np.array(
    [
        [1, 2, np.nan, np.nan],
        [3, np.nan, 4, np.nan],
        [5, 6, 7, np.nan],
        [8, np.nan, np.nan, np.nan],
        [9, 10, np.nan, np.nan],
        [11, np.nan, np.nan, 12],
    ]
)

#: Expected (values, mask) per output for ``keep=False`` — the masks are
#: relative to the rows that survived the previous outputs' filtering.
PER_OUTPUT_EXPECTED_6X4_NOKEEP = [
    ([1, 3, 5, 8, 9, 11], [True, True, True, True, True, True]),
    ([2, 6, 10], [True, False, True, False, True, False]),
    ([7], [False, True, False]),
    ([], [False]),
]

#: Expected per output for ``keep=True`` (``None`` marks a NaN yielded for
#: imputation).
PER_OUTPUT_EXPECTED_6X4_KEEP = [
    ([1, 3, 5, 8, 9, 11], [True, True, True, True, True, True]),
    ([2, None, 6, 10, None], [True, True, True, False, True, True]),
    ([4, 7, None], [False, True, True, False, True]),
    ([12], [False, False, True]),
]
