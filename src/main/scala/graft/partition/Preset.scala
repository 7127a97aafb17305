package graft.partition

/** Preset ladder (reference `apps/KaMinPar.cc:93-99` ships fast/default/eco/strong/
  * largek; `presets.cc` maps them to refinement chains). The engine's equivalents:
  *
  *  - `fast`: skip JET, polish and pairwise FM, 3 refinement supersteps — the "one
  *    cheap pass per level" configuration for latency-bound runs (reference `fast`
  *    skips its k-way FM the same way).
  *  - `default`: the chain every test and bench exercises — 5 LP refinement
  *    supersteps, 3 JET rounds (early-exit), 3 polish supersteps, 2 pairwise-FM
  *    rounds per level at BFS radius 2.
  *  - `eco`: default + a deeper pairwise-FM/flow stage (3 rounds, radius 3) — more
  *    of the quotient graph refined per level at modest extra cost (the reference's
  *    `eco` buys quality through extra FM effort the same way).
  *  - `strong`: eco + 5 JET rounds and 5 polish supersteps — the full-effort rung
  *    (reference `strong` = eco + more refinement iterations).
  *  - `largek`: extension thresholds tuned for k in the thousands — deep-MGP
  *    extension starts at k >= 16 and targets smaller (128-node) intermediate
  *    blocks, so more of the k-growth happens distributed during uncoarsening
  *    (the reference's `largek` preset role).
  */
final case class Preset(
    name: String,
    refineIters: Int,
    jetRounds: Int,
    polishIters: Int,
    pairFmRounds: Int,
    extendMinK: Int,
    extendCExt: Long,
    /** BFS radius of the pairwise-FM border regions (deeper = larger driver
      * regions = more non-local swaps found, at more collect cost).
      */
    pairFmRadius: Int = 2,
    /** Distributed V-cycles after uncoarsening (O16 vcycle scheme): same-block
      * restricted re-coarsening + driver full-k re-search (+ ILS basin hopping on
      * the coarse basis, round 5) + refine-on-the-way-down — the escape hatch for
      * fine-level structural minima. 0 for fast/default (matching the reference,
      * whose default preset does not V-cycle either — vcycling is its separate
      * quality mode); eco pays for 1 cycle, strong for 5 (measured round 5: the
      * stuck-seed tail closes between cycle 3 and 5, and with best-state tracking
      * extra cycles are non-worsening per seed).
      */
    vcycles: Int = 0,
    /** ILS basin-hopping kicks on the whole-graph driver path (each kick = seeded
      * boundary perturbation + full repolish, best-(feasible, cut) kept — see
      * `SeqPartitioner.ilsRefine`). 0 for fast (latency contract); the quality
      * rungs pay more. Orthogonal to `vcycles`, which is the DISTRIBUTED path's
      * escape mechanism. Depth chosen from the measured round-5 sweep on Walshaw
      * `data` k=16 over 8 seeds (avg cut / per-seed wall): 12 → 1175 / 3–5 s,
      * 48 → 1170 / 5–13 s, 96 → 1168 / 7–17 s, 192 → 1165 / 14–21 s — the knee
      * is at 48; eco/strong pay for 96.
      */
    ilsKicks: Int = 48,
    /** High-degree LP clustering filters (SURVEY P4, reference
      * `label_propagation.h:106-118`): nodes above `lpLargeDegreeThreshold` never
      * move during clustering, and nodes over `lpMaxNumNeighbors` rate only a
      * deterministic sample of their neighborhood. Defaults are unlimited, matching
      * the reference's default preset (`presets.cc:144-145`); web crawls with
      * pathological hubs set a threshold (the reference's initial-partitioning
      * coarsening uses 10^6, `presets.cc:194`).
      */
    lpLargeDegreeThreshold: Long = Long.MaxValue,
    lpMaxNumNeighbors: Long = Long.MaxValue
)

object Preset {
  val Default: Preset = Preset("default", 5, 3, 3, 2, DistExtend.MinExtendK, DistExtend.CExt)
  val Fast: Preset =
    Preset("fast", 3, 0, 0, 0, DistExtend.MinExtendK, DistExtend.CExt, ilsKicks = 0)
  val Eco: Preset =
    Preset("eco", 5, 3, 3, 3, DistExtend.MinExtendK, DistExtend.CExt, pairFmRadius = 3,
      vcycles = 1, ilsKicks = 96)
  val Strong: Preset =
    Preset("strong", 5, 5, 5, 3, DistExtend.MinExtendK, DistExtend.CExt, pairFmRadius = 3,
      vcycles = 5, ilsKicks = 96)
  // ilsKicks pinned explicitly (r06, ADVICE): per-kick polish cost scales with k,
  // and the sweep that justified the case-class default of 48 was measured at k=16
  // only — largek (k in the thousands) keeps the pre-sweep depth of 12 so preset
  // behavior cannot drift with the default.
  val LargeK: Preset = Preset("largek", 5, 2, 3, 1, 16, 128L, ilsKicks = 12)

  def byName(name: String): Preset = name match {
    case "default" => Default
    case "fast" => Fast
    case "eco" => Eco
    case "strong" => Strong
    case "largek" => LargeK
    case other => throw new IllegalArgumentException(
      s"unknown preset '$other' (available: fast, default, eco, strong, largek)")
  }
}
