"""Image and feature visualization (reference: snap/viz/image.py).

Includes the PCA feature->RGB projection with save/load of the fitted basis.
"""

from __future__ import annotations

import pickle
from typing import List, Optional, Sequence

import numpy as np


def plot_images(
    images: Sequence[np.ndarray],
    titles: Optional[Sequence[str]] = None,
    cols: int = 4,
    figsize: float = 3.0,
    cmap: str = 'viridis',
):
  """Plot a list of images in a grid."""
  import matplotlib.pyplot as plt
  n = len(images)
  cols = min(cols, n)
  rows = -(-n // cols)
  fig, axes = plt.subplots(
      rows, cols, figsize=(figsize * cols, figsize * rows), squeeze=False)
  for i, img in enumerate(images):
    ax = axes[i // cols][i % cols]
    ax.imshow(np.asarray(img), cmap=None if img.ndim == 3 else cmap)
    ax.set_axis_off()
    if titles is not None:
      ax.set_title(titles[i])
  for i in range(n, rows * cols):
    axes[i // cols][i % cols].set_axis_off()
  return fig


def add_categorical_legend(ax, names: Sequence[str], colors: Sequence):
  """Attach a categorical color legend to an axis."""
  import matplotlib.patches as mpatches
  handles = [
      mpatches.Patch(color=c, label=n) for n, c in zip(names, colors)
  ]
  ax.legend(handles=handles, loc='upper right', fontsize='small')


class FeaturePCA:
  """Project high-dim features to RGB via a fitted 3-component PCA."""

  def __init__(self):
    self.mean_: Optional[np.ndarray] = None
    self.components_: Optional[np.ndarray] = None
    self.mins_: Optional[np.ndarray] = None
    self.maxs_: Optional[np.ndarray] = None

  def fit(self, features: np.ndarray, mask: Optional[np.ndarray] = None):
    flat = np.asarray(features).reshape(-1, features.shape[-1])
    if mask is not None:
      flat = flat[np.asarray(mask).reshape(-1)]
    self.mean_ = flat.mean(0)
    centered = flat - self.mean_
    # Top-3 principal directions via SVD of the (sub-sampled) data matrix.
    if len(centered) > 20_000:
      idx = np.random.default_rng(0).choice(len(centered), 20_000,
                                            replace=False)
      centered_fit = centered[idx]
    else:
      centered_fit = centered
    _, _, vt = np.linalg.svd(centered_fit, full_matrices=False)
    self.components_ = vt[:3]
    proj = centered @ self.components_.T
    self.mins_ = np.percentile(proj, 1, axis=0)
    self.maxs_ = np.percentile(proj, 99, axis=0)
    return self

  def __call__(self, features: np.ndarray) -> np.ndarray:
    assert self.components_ is not None, 'fit() or load() first'
    shape = features.shape[:-1]
    proj = (np.asarray(features).reshape(-1, features.shape[-1])
            - self.mean_) @ self.components_.T
    rgb = (proj - self.mins_) / np.maximum(self.maxs_ - self.mins_, 1e-9)
    return np.clip(rgb, 0, 1).reshape(*shape, 3)

  def save(self, path: str):
    with open(path, 'wb') as f:
      pickle.dump(
          dict(mean=self.mean_, components=self.components_,
               mins=self.mins_, maxs=self.maxs_), f)

  @classmethod
  def load(cls, path: str) -> 'FeaturePCA':
    with open(path, 'rb') as f:
      data = pickle.load(f)
    pca = cls()
    pca.mean_ = data['mean']
    pca.components_ = data['components']
    pca.mins_ = data['mins']
    pca.maxs_ = data['maxs']
    return pca


def features_to_rgb(
    *feature_maps: np.ndarray,
    masks: Optional[Sequence[np.ndarray]] = None,
    pca: Optional[FeaturePCA] = None,
) -> List[np.ndarray]:
  """Joint PCA->RGB over several feature maps (shared color space)."""
  flat = np.concatenate(
      [np.asarray(f).reshape(-1, f.shape[-1]) for f in feature_maps], 0)
  if pca is None:
    mask = None
    if masks is not None:
      mask = np.concatenate([np.asarray(m).reshape(-1) for m in masks], 0)
    pca = FeaturePCA().fit(flat, mask)
  return [pca(f) for f in feature_maps]
