"""D8 hydrological flow operators (GRASS r.watershed / ArcGIS Flow
Direction + Flow Accumulation family) over integer elevation grids.

Reference scope: the reference's raster toolbox carries the focal /
zonal / proximity analysis families (SpatialGetisOrd.scala,
UtilsML neighborhood ops); D8 drainage is the canonical next member a
land-use user reaches for. Both operators are exact-integer,
shuffle-bounded compositions:

- :func:`d8_directions`: one offset-explode + one grid equi-join (the
  proximity discipline — never a pixel self-join), steepest-descent
  arg-max via a single packed BIGINT key, so no float ordering and no
  window anywhere. drop²·(3−d²) cross-multiplies the slope comparison
  drop/√d² onto integers (d² ∈ {1,2}), and the packed low 3 bits
  carry the deterministic direction tie-break.
- :func:`flow_accumulation`: upstream-contributor counts within a
  BOUNDED path depth — ``depth`` rounds of frontier ⋈ edges pointer
  chasing with the connected_components localCheckpoint discipline.
  Strictly-downhill edges make the flow graph a DAG (elevation
  strictly decreases), so every (source, downstream) pair appears
  exactly once and the count is exact. Full-basin accumulation =
  depth ≥ grid diameter; at 100 TB the bounded depth IS the scale
  contract (work is |edges|·depth worst case, each round one hash
  equi-join on the cell key).
- :func:`flow_accumulation_full`: the same counts over the WHOLE flow
  path via Euler tour + weighted list ranking — O(log) shuffle rounds
  with O(n) state per round (never the O(n·L) transitive closure),
  the scale path when flow paths run thousands of cells.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# D8 neighbor offsets in tie-break priority order (E, SE, S, SW, W,
# NW, N, NE — lowest index wins on equal slope)
D8_OFFSETS = [
    (0, 1, 0), (1, 1, 1), (2, 0, 1), (3, -1, 1),
    (4, -1, 0), (5, -1, -1), (6, 0, -1), (7, 1, -1),
]


def d8_directions(cells: DataFrame) -> DataFrame:
    """``cells`` (gx int, gy int, elev bigint) → (gx, gy, elev, dir)
    with ``dir`` the steepest strictly-downhill D8 neighbor index
    (tie-break: lowest index) or -1 for a pit/flat cell.

    Neighbors resolve through ONE equi-join of the 8-way offset
    explode against the grid; the arg-max folds into
    max(drop²·(3−d²)·8 + (7−dir)) — exact integers end to end.

    Contract: the |drop| between neighbors must stay <=
    sqrt(2^63/16) = 759,250,124 or the packed key drop²·(3−d²)·8
    overflows BIGINT and picks a wrong direction, so |elev| is
    guarded at 379,000,000 (< 759,250,124/2 = 379,625,062, so ANY
    in-guard drop fits — 2·3.8e8 would already wrap: 16·(7.6e8)² =
    9.2416e18 > 2^63−1 = 9.2234e18). Any real DEM (Everest in
    millimeters is 8.8e6) is orders of magnitude inside the bound; it
    is asserted here because the declared elev domain (bigint) would
    otherwise permit silent wraparound.
    """
    # cheap row-local guard: passes every in-domain value through,
    # fails loudly on a domain violation instead of returning a wrong
    # arg-max
    cells = cells.withColumn(
        "elev",
        F.when(F.abs(F.col("elev")) <= F.lit(379_000_000), F.col("elev"))
        .otherwise(F.raise_error(F.lit(
            "d8_directions: |elev| exceeds the 3.79e8 packed-key bound"
        ))),
    )
    offs = F.array(
        *[
            F.struct(
                F.lit(d).alias("dir"),
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(dx * dx + dy * dy).alias("d2"),
            )
            for d, dx, dy in D8_OFFSETS
        ]
    )
    probes = cells.select(
        "gx", "gy", "elev", F.explode(offs).alias("o")
    ).select(
        "gx",
        "gy",
        "elev",
        (F.col("gx") + F.col("o.dx")).alias("nx"),
        (F.col("gy") + F.col("o.dy")).alias("ny"),
        "o.dir",
        "o.d2",
    )
    nb = cells.select(
        F.col("gx").alias("nx"),
        F.col("gy").alias("ny"),
        F.col("elev").alias("nelev"),
    )
    drop = F.col("elev") - F.col("nelev")
    packed = (
        drop * drop * (F.lit(3) - F.col("d2")) * 8 + (F.lit(7) - F.col("dir"))
    )
    best = (
        probes.join(nb, ["nx", "ny"])
        .where(drop > 0)
        .groupBy("gx", "gy")
        .agg(F.max(packed).alias("p"))
        .select(
            "gx", "gy", (F.lit(7) - F.col("p") % 8).cast("int").alias("dir")
        )
    )
    return cells.join(best, ["gx", "gy"], "left").select(
        "gx",
        "gy",
        "elev",
        F.coalesce("dir", F.lit(-1)).cast("int").alias("dir"),
    )


def flow_edges(directed: DataFrame, width: int) -> DataFrame:
    """(gx, gy, dir) rows with dir >= 0 → (u, v) BIGINT cell-id edges
    following the D8 direction."""
    dx = F.element_at(
        F.array(*[F.lit(d[1]) for d in D8_OFFSETS]), F.col("dir") + 1
    )
    dy = F.element_at(
        F.array(*[F.lit(d[2]) for d in D8_OFFSETS]), F.col("dir") + 1
    )
    return directed.where(F.col("dir") >= 0).select(
        (F.col("gy") * width + F.col("gx")).cast("long").alias("u"),
        ((F.col("gy") + dy) * width + F.col("gx") + dx)
        .cast("long")
        .alias("v"),
    )


def flow_accumulation(edges: DataFrame, depth: int) -> DataFrame:
    """(u, v) strictly-downhill edges → (v, acc): the number of
    upstream cells whose flow path reaches ``v`` in <= ``depth``
    steps. ``depth`` rounds of frontier ⋈ edges; the edge relation
    and EVERY round checkpoint (see the inline task-binary notes —
    the one loop where the connected_components every-N cadence is
    too loose)."""
    # the edge relation is re-referenced depth times (every round's
    # probe side and every union branch): without this checkpoint the
    # full upstream plan (grid synthesis → d8 arg-max) serializes into
    # EVERY task binary — measured 24.5 MiB/task at depth 12; with it
    # the loop references a plain materialized relation
    edges = edges.localCheckpoint(eager=True)
    frontier = edges
    layers = [edges]
    for s in range(2, depth + 1):
        nxt = edges.select(
            F.col("u").alias("v"), F.col("v").alias("w")
        )
        frontier = frontier.join(nxt, "v").select(
            "u", F.col("w").alias("v")
        )
        # cadence-2 checkpointing (r11): every OTHER round (and the
        # last) materializes. The r8 13-24 MiB task binaries came from
        # un-checkpointed layers re-embedding the full upstream grid
        # synthesis; with the edge relation checkpointed above, a lazy
        # layer is ONE hash join over two plain cached relations (~KB
        # of plan), and halving the eager materializations removes
        # ~depth/2 fixed job costs per query (measured 0.25-0.35 s
        # each at fixture scale on local[32])
        if s % 2 == 0 or s == depth:
            frontier = frontier.localCheckpoint(eager=True)
        layers.append(frontier)
    allp = layers[0]
    for l in layers[1:]:
        allp = allp.unionByName(l)
    return allp.groupBy("v").agg(F.count(F.lit(1)).alias("acc"))


def flow_accumulation_full(edges: DataFrame,
                           max_rounds: int = 48,
                           stats: dict | None = None) -> DataFrame:
    """(u, v) strictly-downhill edges → (v, acc): upstream-contributor
    counts over the FULL flow horizon — every path length — with
    O(n) state per shuffle round (r10, VERDICT r9 #1).

    Euler tour + weighted list ranking, the textbook subtree-size
    algorithm: acc(v) = |subtree(v)| − 1 in the in-forest where every
    cell points at its downstream neighbor. The transitive-closure
    form this replaces (kept as :func:`flow_accumulation_closure` for
    the equality tests) materialized every (source, downstream) pair —
    Σ path lengths = O(n·L) rows for horizon L, 3–4 orders of
    magnitude more state than the n-sized answer on continental grids.
    Here total state is exactly 2n arc rows in EVERY round:

    1. Each tree edge (child u → parent v) contributes a down-arc
       (enter u, id 2u) and an up-arc (leave u, id 2u+1); roots get a
       virtual sentinel parent so the formula is uniform. The Euler
       tour successor is local arithmetic over (parent, first-child,
       next-sibling) — one window shuffle partitioned by parent.
    2. Weighted list ranking by pointer doubling: d(x) = number of
       arcs strictly after x in its tour, computed in
       ceil(log2 max-tour-length) rounds of one hash equi-join each,
       each round carrying exactly one (ptr, d) pair per arc —
       *partial sums instead of pairs*, the same O(n)-state
       discipline :func:`watershed_roots` uses.
    3. The arcs of v's subtree sit strictly between down(v) and
       up(v), so d(down_v) − d(up_v) = 2·|subtree(v)| − 1 and
       acc(v) = (d(down_v) − d(up_v) − 1) >> 1 — exact integers end
       to end, read off with one groupBy on the node id.

    Identical output to the closure/bounded forms (only targets with
    acc >= 1 are returned). Rounds are ceil(log2 2n) worst-case —
    vs the closure's ceil(log2 L) — but each round's state is 2n,
    never n·L; the loop stops early once every arc has reached its
    tour end. Per-round eager localCheckpoint keeps lineage and task
    binaries flat (the flow_accumulation discipline).

    ``stats`` (optional dict) receives ``{"rounds": r, "state_rows":
    2n}`` — measured doubling rounds and the (constant) per-round
    state size the scale probe records.
    """
    edges = edges.localCheckpoint(eager=True)
    # child ordering within each parent: first child starts the
    # descent, next sibling continues the sweep — one shuffle on v
    w = W.partitionBy("v").orderBy("u")
    ch = edges.select(
        "u",
        "v",
        F.lead("u").over(w).alias("sib"),
        F.row_number().over(w).alias("rk"),
    ).localCheckpoint(eager=True)
    first_child = ch.where(F.col("rk") == 1).select(
        F.col("v").alias("n"), F.col("u").alias("fc")
    )
    # one row per node: child nodes carry (parent, next sibling);
    # roots (targets that are never sources) carry neither
    roots = (
        edges.select(F.col("v").alias("n"))
        .distinct()
        .join(edges.select(F.col("u").alias("n")).distinct(), "n",
              "left_anti")
    )
    nodes = ch.select(
        F.col("u").alias("n"), F.col("v").alias("par"), "sib"
    ).unionByName(
        roots.select(
            "n", F.lit(None).cast("long").alias("par"),
            F.lit(None).cast("long").alias("sib"),
        )
    ).join(first_child, "n", "left")
    # Euler-tour successor, all local arithmetic: down(n)=2n enters n
    # (next: descend to first child, else bounce straight up);
    # up(n)=2n+1 leaves n (next: next sibling's descent, else leave
    # the parent; roots end their tour → null)
    down = nodes.select(
        (F.col("n") * 2).alias("id"),
        F.coalesce(F.col("fc") * 2, F.col("n") * 2 + 1).alias("ptr"),
    )
    up = nodes.select(
        (F.col("n") * 2 + 1).alias("id"),
        F.when(F.col("sib").isNotNull(), F.col("sib") * 2)
        .when(F.col("par").isNotNull(), F.col("par") * 2 + 1)
        .alias("ptr"),
    )
    arcs = down.unionByName(up).select(
        "id", "ptr",
        F.when(F.col("ptr").isNotNull(), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("d"),
    ).localCheckpoint(eager=True)
    n_arcs = arcs.count()
    # weighted list ranking: each round jumps 2^k arcs ahead, summing
    # the carried distance — state is exactly n_arcs rows per round
    rounds_run = 0
    drained = False
    # r11 loop shape, two changes (measured together 2.0 s → 1.2 s for
    # the 8-round loop at n_arcs=1536 on local[32]):
    # 1. one LEFT join per jump instead of filter + inner join + union
    #    of the drained rows — a null ptr never matches, so p2 stays
    #    null and the row keeps its distance through coalesce; same
    #    fixpoint, one scan of the arc relation per round, not three.
    # 2. cadence-2 checkpoints/drain probes: two jumps compose lazily
    #    between materializations, halving the fixed per-round job
    #    costs (isEmpty + localCheckpoint were ~0.3 s/round). An extra
    #    no-op jump after drain is identity.
    for r in range(max_rounds):
        hop = arcs.select(
            F.col("id").alias("ptr"),
            F.col("ptr").alias("p2"),
            F.col("d").alias("d2"),
        )
        arcs = arcs.join(hop, "ptr", "left").select(
            "id",
            F.col("p2").alias("ptr"),
            (F.col("d") + F.coalesce(F.col("d2"), F.lit(0))).alias("d"),
        )
        rounds_run += 1
        if r % 2 == 1 or r == max_rounds - 1:
            arcs = arcs.localCheckpoint(eager=True)
            if arcs.where(F.col("ptr").isNotNull()).isEmpty():
                drained = True
                break
    if stats is not None:
        # under cadence-2 drain probes the loop may execute one no-op
        # jump past the true drain round; ceil(log2 n_arcs) bounds the
        # drain round from above (every tour is <= n_arcs long), so
        # the min is the tight honest "rounds needed" figure the scale
        # probe records
        bound = (
            max(1, math.ceil(math.log2(n_arcs))) if n_arcs > 0 else 0
        )
        stats["rounds"] = min(rounds_run, bound)
        stats["state_rows"] = n_arcs
    # a ranking loop that exits via max_rounds without draining means
    # the edge set was cyclic (not a forest) or the tour outran
    # 2^max_rounds arcs — either way the dd-du subtree formula below
    # would return silently WRONG counts, so refuse instead. The check
    # costs nothing when the loop broke: its own isEmpty proved drain.
    if not drained:
        undrained = arcs.where(F.col("ptr").isNotNull())
        if not undrained.isEmpty():
            if stats is not None:
                stats["undrained_arcs"] = undrained.count()
            raise ValueError(
                "flow_accumulation_full: list ranking did not converge "
                f"in {max_rounds} rounds — the edge set is cyclic (not "
                "a drainage forest) or the tour exceeds 2^max_rounds "
                "arcs"
            )
    # subtree size off the two tour ranks of each node: one groupBy.
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative
    # odd arc id would satisfy neither branch and drop the node
    by_node = arcs.groupBy(
        F.shiftright(F.col("id"), 1).alias("v")
    ).agg(
        F.max(F.when(F.pmod(F.col("id"), 2) == 0, F.col("d"))).alias("dd"),
        F.max(F.when(F.pmod(F.col("id"), 2) == 1, F.col("d"))).alias("du"),
    )
    return by_node.select(
        "v",
        F.shiftright(F.col("dd") - F.col("du") - 1, 1).alias("acc"),
    ).where(F.col("acc") >= 1)


def flow_accumulation_closure(edges: DataFrame,
                              max_rounds: int = 16,
                              stats: dict | None = None) -> DataFrame:
    """The r9 transitive-closure form of full-horizon accumulation,
    kept as the independent cross-check for
    :func:`flow_accumulation_full`'s Euler-tour rewrite (equality
    pinned in tests/test_flow.py). Pointer doubling over a ``jump``
    relation extends a materialized ``closure`` of every (source,
    downstream) pair — O(log L) rounds but O(n·L) total closure rows,
    which is why it is no longer the production path."""
    closure = edges.localCheckpoint(eager=True)
    jump = closure
    rounds_run = 0
    for _ in range(max_rounds):
        mid = jump.select("u", F.col("v").alias("m"))
        ext = (
            mid.join(
                closure.select(
                    F.col("u").alias("m"), F.col("v").alias("w")
                ),
                "m",
            )
            .select("u", F.col("w").alias("v"))
            .localCheckpoint(eager=True)
        )
        nxt_jump = (
            mid.join(
                jump.select(F.col("u").alias("m"), F.col("v").alias("w")),
                "m",
            )
            .select("u", F.col("w").alias("v"))
            .localCheckpoint(eager=True)
        )
        closure = closure.unionByName(ext).localCheckpoint(eager=True)
        jump = nxt_jump
        rounds_run += 1
        if jump.isEmpty():
            break
    if stats is not None:
        stats["rounds"] = rounds_run
    return closure.groupBy("v").agg(F.count(F.lit(1)).alias("acc"))


def watershed_roots(edges: DataFrame, cells_ids: DataFrame,
                    rounds: int = 8, early_stop: bool = False,
                    stats: dict | None = None) -> DataFrame:
    """(u, v) strictly-downhill edges + the full cell-id relation →
    (u, root): the terminal pit each cell ultimately drains to.

    Pointer DOUBLING, not pointer chasing: pits self-loop, and each of
    the ``rounds`` iterations composes the parent map with itself
    (parent ∘ parent), so reach doubles per round — O(log diameter)
    rounds for full-basin labeling where flow_accumulation's bounded
    depth pays one round per step. 2^rounds must exceed the longest
    flow path (rounds=8 covers diameter 256; at continental grids set
    rounds = ceil(log2(diameter))). The same per-round
    localCheckpoint discipline as connected_components keeps lineage
    and task binaries flat.

    ``early_stop=True`` breaks once a doubling round changes no
    parent (every pointer reached its self-looping pit) at the cost
    of one changed-row count per round; ``stats`` then receives the
    measured ``{"rounds": r}`` for the scale probe.
    """
    pits = cells_ids.join(edges.select("u").distinct(), "u", "left_anti")
    parent = edges.unionByName(
        pits.select("u", F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    rounds_run = 0
    for r in range(rounds):
        prev = parent
        parent = (
            parent.join(
                parent.select(
                    F.col("u").alias("v"), F.col("v").alias("w")
                ),
                "v",
            )
            .select("u", F.col("w").alias("v"))
        )
        # cadence-2 checkpoints in the fixed-rounds form (r11): a lazy
        # doubling round is one self-join over plain cached relations,
        # so materializing every other round halves the fixed job
        # costs; early_stop keeps per-round checkpoints because its
        # convergence probe joins consecutive materialized rounds
        if early_stop or r % 2 == 1 or r == rounds - 1:
            parent = parent.localCheckpoint(eager=True)
        rounds_run += 1
        if early_stop:
            converged = (
                parent.join(prev.withColumnRenamed("v", "pv"), "u")
                .where(F.col("v") != F.col("pv"))
                .isEmpty()
            )
            if converged:
                break
    if stats is not None:
        stats["rounds"] = rounds_run
    return parent.select("u", F.col("v").alias("root"))


def strahler_orders(edges: DataFrame, cells_ids: DataFrame,
                    rounds: int = 8, early_stop: bool = False,
                    stats: dict | None = None) -> DataFrame:
    """(u, v) strictly-downhill edges + the full cell-id relation →
    (u, o): the Strahler stream order of every cell (headwaters 1; a
    confluence of >= 2 equal-order tributaries increments).

    Monotone fixpoint iteration: every cell starts at 1 and each
    round recomputes order from its tributaries' current orders —
    max, plus one when the max is shared by two or more. Converges
    once information has crossed the longest tributary chain; the
    fixpoint is order-insensitive (max / count-at-max over the
    collected tributary list, never a float or a position), so the
    nondeterministic collect_list order cannot change the result.
    Each round is one hash equi-join + a fan-in-bounded aggregate
    (<= 8 tributaries per cell on a D8 graph) with the per-round
    localCheckpoint discipline. ``rounds`` must cover the deepest
    chain between confluences; tests pin convergence by comparing
    against ``rounds + 2``.

    ``early_stop=True`` adds one cheap changed-row count per round
    (an anti-join of consecutive checkpointed order vectors) and
    breaks at the fixpoint; ``stats`` then receives
    ``{"rounds": r}`` — the measured rounds-to-convergence the scale
    probe records. The oracle-replayed registry query keeps the
    fixed-rounds form (early_stop=False) so DuckDB unrolls the exact
    same number of iterations.
    """
    edges = edges.localCheckpoint(eager=True)
    # the id relation re-enters every round's left join — checkpoint
    # once so its synthesis plan doesn't re-embed per round
    cells_ids = cells_ids.localCheckpoint(eager=True)
    ord_df = cells_ids.select("u", F.lit(1).cast("int").alias("o"))
    rounds_run = 0
    for _ in range(rounds):
        ch = (
            edges.join(
                ord_df.select(
                    F.col("u").alias("cu"), F.col("o").alias("co")
                ),
                edges["u"] == F.col("cu"),
            )
            .groupBy("v")
            .agg(F.collect_list("co").alias("arr"))
        )
        mx = F.array_max("arr")
        bump = (
            F.size(F.filter(F.col("arr"), lambda x: x == F.array_max("arr")))
            >= 2
        ).cast("int")
        prev = ord_df
        ord_df = (
            cells_ids.join(ch, cells_ids["u"] == ch["v"], "left")
            .select(
                cells_ids["u"],
                F.coalesce(mx + bump, F.lit(1)).cast("int").alias("o"),
            )
        )
        # cadence-2 checkpoints in the fixed-rounds form — see
        # watershed_roots; early_stop keeps per-round materialization
        # for its consecutive-rounds convergence probe
        if early_stop or rounds_run % 2 == 1 or rounds_run == rounds - 1:
            ord_df = ord_df.localCheckpoint(eager=True)
        rounds_run += 1
        if early_stop:
            # both sides are checkpointed plain relations, so the
            # changed-row count is one hash join, not a plan replay
            converged = (
                ord_df.join(prev.withColumnRenamed("o", "po"), "u")
                .where(F.col("o") != F.col("po"))
                .isEmpty()
            )
            if converged:
                break
    if stats is not None:
        stats["rounds"] = rounds_run
    return ord_df
