"""Plotting helpers: Gaussian covariance ellipses and regression bands.

Counterpart of the reference's utils/plot.py:33-113 (matplotlib only; the
reference's tikzplotlib export is dropped — save the figure instead).
Import is lazy so headless/serving deployments never pull matplotlib.
"""

import numpy as np


def plot_gaussian(mu, lmbda, color='b', label='', alpha=1.0, ax=None,
                  num_points=100):
    """Covariance ellipse of N(mu, lmbda^{-1}) (reference plot.py:33-56,
    which takes the covariance; we take the precision for consistency)."""
    import matplotlib.pyplot as plt
    ax = ax or plt.gca()
    mu = np.asarray(mu)
    cov = np.linalg.inv(np.asarray(lmbda))
    t = np.linspace(0, 2 * np.pi, num_points)
    circle = np.vstack([np.sin(t), np.cos(t)])
    ellipse = 2.0 * np.linalg.cholesky(cov) @ circle
    line, = ax.plot(ellipse[0] + mu[0], ellipse[1] + mu[1],
                    linestyle='-', linewidth=2, color=color, label=label,
                    alpha=alpha)
    return [line]


def plot_mixture(x, params, weights, labels=None, ax=None, min_weight=0.01):
    """Scatter + ellipses for a fitted GMM (reference gmm.py:105-144)."""
    import matplotlib.pyplot as plt
    ax = ax or plt.gca()
    x = np.asarray(x)
    k = np.asarray(weights).shape[0]
    cmap = plt.get_cmap('tab10')   # cm.get_cmap was removed in mpl 3.9
    if labels is not None:
        colors = [cmap(l % 10) for l in np.asarray(labels)]
        ax.scatter(x[:, 0], x[:, 1], c=colors, marker='+', alpha=0.4)
    else:
        ax.scatter(x[:, 0], x[:, 1], marker='+', alpha=0.4)
    artists = []
    for j in range(k):
        if weights[j] >= min_weight:
            artists += plot_gaussian(params.mu[j], params.lmbda[j],
                                     color=cmap(j % 10), ax=ax)
    return artists


def plot_regression_band(x, mean, std, y=None, ax=None, color='C0'):
    """Prediction curve with +/- 2 std band (evaluate_sine.py:160-186)."""
    import matplotlib.pyplot as plt
    ax = ax or plt.gca()
    order = np.argsort(np.asarray(x).ravel())
    xs = np.asarray(x).ravel()[order]
    ms = np.asarray(mean).ravel()[order]
    ss = np.asarray(std).ravel()[order]
    if y is not None:
        ax.scatter(np.asarray(x).ravel(), np.asarray(y).ravel(), s=4,
                   alpha=0.3, color='gray')
    ax.plot(xs, ms, color=color)
    ax.fill_between(xs, ms - 2 * ss, ms + 2 * ss, alpha=0.25, color=color)
    return ax


def plot_violin_box(data, labels=None, ax=None):
    """Violin + box plot (reference plot.py:59-113, sans tikz export)."""
    import matplotlib.pyplot as plt
    ax = ax or plt.gca()
    data = [np.asarray(d) for d in data]
    ax.violinplot(data, showmeans=False, showextrema=False)
    ax.boxplot(data, widths=0.15)
    if labels is not None:
        ax.set_xticks(np.arange(1, len(data) + 1), labels=labels)
    return ax
