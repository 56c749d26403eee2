"""Data Splitter CLI: leakage-aware train/val/test splits.

Same strategy cascade as the reference (``instageo/data/data_splitter.py``):
KMeans geo-clusters over MGRS tile centers → MGRS proximity groups
(haversine connectivity) → year groups → random split; the test set is
biased toward the most recent years. Visualizations use matplotlib (the
reference uses cartopy/seaborn, not present in this image).
"""

from __future__ import annotations

import logging
import os
import random
import re
from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import pandas as pd
from absl import app, flags
from sklearn.cluster import KMeans
from sklearn.model_selection import train_test_split
from sklearn.preprocessing import StandardScaler

from instageo_tpu.data.crs import haversine_km, mgrs_to_latlon

FLAGS = flags.FLAGS

if "input_file" not in FLAGS:
    flags.DEFINE_integer("random_state", 42, "Random seed", lower_bound=0)
    flags.DEFINE_float("val_ratio", 0.20, "Validation fraction")
    flags.DEFINE_float("test_ratio", 0.20, "Test fraction")
    flags.DEFINE_boolean("visualize", True, "Generate split visualizations")
    flags.DEFINE_boolean("include_val", True, "Include a validation split")
    flags.DEFINE_boolean("include_test", True, "Include a test split")
    flags.DEFINE_boolean("allow_group_overlap", True,
                         "Allow groups to span multiple splits")
    flags.DEFINE_float("distance_threshold", 400.0,
                       "Km threshold for MGRS proximity groups")
    flags.DEFINE_string("input_file", "", "Path to input CSV file")
    flags.DEFINE_string("output_dir", "", "Base directory for output files")
    flags.DEFINE_integer("n_clusters", 20, "Number of KMeans clusters")
    flags.DEFINE_bool("use_kmeans", True, "Use KMeans clustering first")

# Cache of MGRS tile -> (lat, lon) center.
_mgrs_coord_cache: Dict[str, Optional[Tuple[float, float]]] = {}


def _tile_center(tile: str) -> Optional[Tuple[float, float]]:
    if tile not in _mgrs_coord_cache:
        try:
            _mgrs_coord_cache[tile] = mgrs_to_latlon(tile)
        except Exception:
            _mgrs_coord_cache[tile] = None
    return _mgrs_coord_cache[tile]


def extract_mgrs_tile(file_path: str) -> Optional[str]:
    """First 4-5 char MGRS-looking token in the filename (reference :141-158)."""
    match = re.search(r"(\d{1,2}[a-zA-Z]{3})", os.path.basename(file_path))
    return match.group(1).upper() if match else None


def extract_year(file_path: str) -> Optional[int]:
    """First plausible 4-digit year in the filename (reference :160-178)."""
    matches = re.findall(r"(19[0-9]{2}|20[0-9]{2})", os.path.basename(file_path))
    return int(matches[0]) if matches else None


def _connected_components(tiles: List[str], distance_threshold: float
                          ) -> List[Set[str]]:
    """Connected components under a km threshold, iteratively.

    Vectorized BFS with a lat/lon bounding-box prefilter (the reference's
    prefilter, data_splitter.py:202-228) before the exact haversine — no
    Python recursion and no O(n) scalar distance loop per visit, so
    thousand-tile connected components are cheap and stack-safe.
    """
    n = len(tiles)
    lat = np.full(n, np.nan)
    lon = np.full(n, np.nan)
    for i, t in enumerate(tiles):
        c = _tile_center(t)
        if c:
            lat[i], lon[i] = c
    resolvable = ~np.isnan(lat)
    visited = ~resolvable  # unresolvable tiles become singleton groups
    groups: List[Set[str]] = [{tiles[i]} for i in np.nonzero(~resolvable)[0]]

    dlat_max = distance_threshold / 111.0 * 1.05  # deg, small safety margin
    for start in range(n):
        if visited[start]:
            continue
        visited[start] = True
        comp = [start]
        frontier = [start]
        while frontier:
            i = frontier.pop()
            cos_lat = max(float(np.cos(np.radians(lat[i]))), 1e-6)
            dlon_max = distance_threshold / (111.0 * cos_lat) * 1.05
            dlon = np.abs((lon - lon[i] + 180.0) % 360.0 - 180.0)
            cand = (~visited) & (np.abs(lat - lat[i]) <= dlat_max) \
                & (dlon <= dlon_max)
            idxs = np.nonzero(cand)[0]
            if idxs.size == 0:
                continue
            d = haversine_km(lat[i], lon[i], lat[idxs], lon[idxs])
            near = idxs[d <= distance_threshold]
            visited[near] = True
            comp.extend(near.tolist())
            frontier.extend(near.tolist())
        groups.append({tiles[j] for j in comp})
    return groups


def find_connected_tiles(tile: str, remaining: Set[str],
                         distance_threshold: float) -> Set[str]:
    """All tiles transitively within threshold km of ``tile`` (ref :181-236).

    ``remaining`` is mutated: tiles absorbed into the component are removed.
    """
    pool = [tile] + [t for t in remaining if t != tile]
    for comp in _connected_components(pool, distance_threshold):
        if tile in comp:
            remaining.difference_update(comp)
            return comp
    return {tile}


def group_close_mgrs_tiles(mgrs_tiles: List[str],
                           distance_threshold: float = 400.0) -> List[Set[str]]:
    """Connected components under the km threshold (reference :238-262)."""
    return _connected_components(list(dict.fromkeys(mgrs_tiles)),
                                 distance_threshold)


def save_splits(train_df, val_df, test_df, output_dir: str,
                visualize: bool = False) -> None:
    """Write train/val/test CSVs (+ optional map visualization)."""
    os.makedirs(output_dir, exist_ok=True)
    drop_cols = ["mgrs_tile", "year", "mask", "group_id", "cluster", "lat", "lon"]
    for name, df in (("train", train_df), ("val", val_df), ("test", test_df)):
        if df is None:
            continue
        out = df.drop(columns=[c for c in drop_cols if c in df.columns])
        out.to_csv(os.path.join(output_dir, f"{name}.csv"), index=False)
        logging.info("%s split: %d records", name, len(out))
    if visualize:
        _visualize_splits(train_df, val_df, test_df, output_dir)


def _visualize_splits(train_df, val_df, test_df, output_dir: str) -> None:
    """Scatter of split tile locations (matplotlib; reference uses cartopy)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 6))
        for name, df, color in (("train", train_df, "#3b82f6"),
                                ("val", val_df, "#f59e0b"),
                                ("test", test_df, "#ef4444")):
            if df is None or "mgrs_tile" not in df.columns:
                continue
            pts = [(c[1], c[0]) for c in
                   (_tile_center(t) for t in df["mgrs_tile"].dropna().unique())
                   if c]
            if pts:
                xs, ys = zip(*pts)
                ax.scatter(xs, ys, s=18, label=name, color=color, alpha=0.7)
        ax.set_xlabel("Longitude")
        ax.set_ylabel("Latitude")
        ax.legend()
        fig.savefig(os.path.join(output_dir, "splits_locations.png"), dpi=120)
        plt.close(fig)
    except Exception as e:  # viz is best-effort
        logging.warning("Split visualization failed: %s", e)


def _try_mgrs_groups(df: pd.DataFrame,
                     distance_threshold: float) -> Optional[List[Set[str]]]:
    valid = df["mgrs_tile"].dropna().unique()
    if len(valid) < 2:
        return None
    groups = group_close_mgrs_tiles(list(valid), distance_threshold)
    logging.info("Created %d MGRS groups", len(groups))
    return groups


def _try_year_groups(df: pd.DataFrame) -> Optional[List[Set[int]]]:
    years = sorted(df["year"].dropna().unique(), reverse=True)
    return [{y} for y in years]


def _split_data(
    df: pd.DataFrame,
    groups: List[Set],
    test_ratio: float,
    val_ratio: float,
    include_test: bool,
    include_val: bool,
    allow_group_overlap: bool = True,
):
    """Group-aware split; test takes the most recent groups (ref :701-810)."""
    df = df.copy()
    df["group_id"] = -1
    for i, group in enumerate(groups):
        df.loc[df["mask"].isin(group), "group_id"] = i

    target_test = int(len(df) * test_ratio) if include_test else 0
    target_val = int(len(df) * val_ratio) if include_val else 0

    group_years = []
    for i in range(len(groups)):
        g = df[df["group_id"] == i]
        if len(g):
            group_years.append((i, g["year"].mean(), len(g)))

    test_df = None
    if include_test:
        group_years.sort(key=lambda x: x[1], reverse=True)
        picked: List = []
        size = 0
        for gid, _, _ in group_years:
            if size > target_test:
                break
            idx = df.index[df["group_id"] == gid].tolist()
            picked.extend(idx)
            size += len(idx)
        test_df = df.loc[picked[:target_test]].copy()

    remaining = df[~df.index.isin(test_df.index)] if test_df is not None else df
    test_groups = set(test_df["group_id"].unique()) if test_df is not None else set()
    rem_groups = (group_years if allow_group_overlap
                  else [g for g in group_years if g[0] not in test_groups])
    random.shuffle(rem_groups)

    val_df = None
    if include_val:
        picked = []
        size = 0
        for gid, _, _ in rem_groups:
            if size >= target_val:
                break
            idx = remaining.index[remaining["group_id"] == gid].tolist()
            picked.extend(idx)
            size += len(idx)
        val_df = remaining.loc[picked[:target_val]].copy()

    train_df = (remaining[~remaining.index.isin(val_df.index)]
                if val_df is not None else remaining).copy()
    if not allow_group_overlap and val_df is not None:
        val_groups = set(val_df["group_id"].unique())
        keep = [g[0] for g in rem_groups if g[0] not in val_groups]
        train_df = train_df[train_df["group_id"].isin(keep)]
    return test_df, train_df, val_df


def _try_random_split(df, random_state, test_ratio=0.2, val_ratio=0.2,
                      include_test=True, include_val=True):
    test_df = val_df = None
    train_df = df.copy()
    if include_test:
        train_df, test_df = train_test_split(df, test_size=test_ratio,
                                             random_state=random_state)
    if include_val:
        adj = val_ratio / (1 - test_ratio) if include_test else val_ratio
        train_df, val_df = train_test_split(train_df, test_size=adj,
                                            random_state=random_state)
    return test_df, train_df, val_df


def _try_kmeans_split(df: pd.DataFrame, n_clusters: int, test_ratio: float,
                      val_ratio: float, output_dir: str, visualize: bool,
                      random_state: int = 42, include_test: bool = True,
                      include_val: bool = True) -> None:
    """Geo-cluster split: merge nearest clusters until targets met (ref :856)."""
    df = df.copy()
    centers = df["mgrs_tile"].map(_tile_center)
    df["lat"] = centers.map(lambda c: c[0] if c else np.nan)
    df["lon"] = centers.map(lambda c: c[1] if c else np.nan)
    n_invalid = int(df[["lat", "lon"]].isna().any(axis=1).sum())
    if n_invalid:
        # Reference behavior (data_splitter.py:1057-1061): rows whose
        # filenames yield no resolvable MGRS position cannot be
        # spatially grouped and are excluded — loudly, never silently.
        logging.warning(
            "Filtering out %d records with unresolvable MGRS tiles — "
            "they will appear in NO split.", n_invalid)
    df = df.dropna(subset=["lat", "lon"])
    n_clusters = min(n_clusters, max(1, df[["lat", "lon"]].drop_duplicates().shape[0]))
    coords = StandardScaler().fit_transform(df[["lat", "lon"]])
    km = KMeans(n_clusters=n_clusters, random_state=random_state, n_init=10)
    df["cluster"] = km.fit_predict(coords)
    centroids = km.cluster_centers_

    def grow(target: int, available: Set[int], frame: pd.DataFrame) -> Set[int]:
        chosen: Set[int] = set()
        size = 0
        while size < target and available:
            if not chosen:
                nxt = min(available,
                          key=lambda c: len(frame[frame["cluster"] == c]))
            else:
                # nearest available cluster to the chosen set's centroids
                nxt = min(available, key=lambda c: min(
                    np.linalg.norm(centroids[c] - centroids[s]) for s in chosen))
            available.remove(nxt)
            chosen.add(nxt)
            size = len(frame[frame["cluster"].isin(chosen)])
        return chosen

    available = set(range(n_clusters))
    test_clusters = (grow(int(len(df) * test_ratio), available, df)
                     if include_test else set())
    remaining = df[~df["cluster"].isin(test_clusters)]
    val_clusters = (grow(int(len(df) * val_ratio), available, remaining)
                    if include_val else set())

    test_df = df[df["cluster"].isin(test_clusters)].copy()
    val_df = remaining[remaining["cluster"].isin(val_clusters)].copy()
    train_df = remaining[remaining["cluster"].isin(available)].copy()
    logging.info("KMeans splits: test=%d val=%d train=%d",
                 len(test_df), len(val_df), len(train_df))
    save_splits(train_df, val_df, test_df, output_dir, visualize)


def split_dataset(
    df: pd.DataFrame,
    val_ratio: float = 0.15,
    test_ratio: float = 0.15,
    random_state: int = 42,
    save_viz: bool = True,
    include_val: bool = True,
    include_test: bool = True,
    distance_threshold: float = 400.0,
    output_dir: str = "dataset_splits",
    allow_group_overlap: bool = True,
    use_kmeans: bool = True,
    n_clusters: int = 20,
) -> None:
    """Strategy cascade (reference :953-1040)."""
    random.seed(random_state)
    np.random.seed(random_state)

    df = df.copy()
    df["mgrs_tile"] = df["Input"].apply(extract_mgrs_tile)
    df["year"] = df["Input"].apply(extract_year)

    if use_kmeans and df["mgrs_tile"].notna().any():
        logging.info("Using KMeans clustering strategy")
        _try_kmeans_split(df, n_clusters, test_ratio, val_ratio,
                          output_dir, save_viz,
                          random_state=random_state,
                          include_test=include_test,
                          include_val=include_val)
        return

    mgrs_groups = _try_mgrs_groups(df, distance_threshold)
    if mgrs_groups and len(mgrs_groups) >= 2:
        logging.info("Using MGRS tile grouping strategy")
        df["mask"] = df["mgrs_tile"]
        test_df, train_df, val_df = _split_data(
            df, mgrs_groups, test_ratio, val_ratio, include_test, include_val,
            allow_group_overlap)
        save_splits(train_df, val_df, test_df, output_dir, save_viz)
        return

    year_groups = _try_year_groups(df)
    if year_groups and len(year_groups) >= 2:
        logging.info("Using year-based splitting strategy")
        df["mask"] = df["year"]
        test_df, train_df, val_df = _split_data(
            df, year_groups, test_ratio, val_ratio, include_test, include_val,
            allow_group_overlap)
        save_splits(train_df, val_df, test_df, output_dir, save_viz)
        return

    logging.info("Using random splitting strategy")
    test_df, train_df, val_df = _try_random_split(
        df, random_state, test_ratio, val_ratio, include_test, include_val)
    save_splits(train_df, val_df, test_df, output_dir, save_viz)


def main(argv) -> None:
    del argv
    df = pd.read_csv(FLAGS.input_file)
    split_dataset(
        df,
        val_ratio=FLAGS.val_ratio,
        test_ratio=FLAGS.test_ratio,
        random_state=FLAGS.random_state,
        save_viz=FLAGS.visualize,
        include_val=FLAGS.include_val,
        include_test=FLAGS.include_test,
        distance_threshold=FLAGS.distance_threshold,
        output_dir=FLAGS.output_dir,
        allow_group_overlap=FLAGS.allow_group_overlap,
        use_kmeans=FLAGS.use_kmeans,
        n_clusters=FLAGS.n_clusters,
    )


if __name__ == "__main__":
    app.run(main)
