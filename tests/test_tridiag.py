import numpy as np

from wrfchem_arc_interactions_tpu.dycore.tridiag import thomas


def test_thomas_matches_dense():
    rng = np.random.default_rng(0)
    n, ny, nx = 12, 3, 5
    a = rng.uniform(-0.3, -0.1, (n, ny, nx)).astype(np.float32)
    cc = rng.uniform(-0.3, -0.1, (n, ny, nx)).astype(np.float32)
    b = (1.0 + np.abs(a) + np.abs(cc)).astype(np.float32)  # diagonally dominant
    d = rng.normal(size=(n, ny, nx)).astype(np.float32)
    a[0] = 0.0
    cc[-1] = 0.0
    x = np.asarray(thomas(a, b, cc, d))
    # dense check per column
    for j in range(ny):
        for i in range(nx):
            m = np.zeros((n, n))
            for k in range(n):
                m[k, k] = b[k, j, i]
                if k > 0:
                    m[k, k - 1] = a[k, j, i]
                if k < n - 1:
                    m[k, k + 1] = cc[k, j, i]
            ref = np.linalg.solve(m, d[:, j, i])
            np.testing.assert_allclose(x[:, j, i], ref, rtol=2e-5, atol=2e-5)
