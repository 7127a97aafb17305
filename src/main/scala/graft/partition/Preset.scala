package graft.partition

/** Preset ladder (reference `apps/KaMinPar.cc:93-99` ships fast/default/eco/strong/
  * largek; `presets.cc` maps them to refinement chains). The engine's equivalents:
  *
  *  - `default`: the chain every test and bench exercises — 5 LP refinement
  *    supersteps, 3 JET rounds (early-exit), 3 polish supersteps, 2 pairwise-FM
  *    rounds per level.
  *  - `fast`: skip JET and the polish, 3 refinement supersteps — the "one cheap
  *    pass per level" configuration for latency-bound runs (reference `fast` skips
  *    its k-way FM the same way).
  *  - `largek`: extension thresholds tuned for k in the thousands — deep-MGP
  *    extension starts at k >= 16 and targets smaller (128-node) intermediate
  *    blocks, so more of the k-growth happens distributed during uncoarsening
  *    (the reference's `largek` preset role).
  *
  * `eco`/`strong` are out of scope with the flow refiner (SURVEY O21).
  */
final case class Preset(
    name: String,
    refineIters: Int,
    jetRounds: Int,
    polishIters: Int,
    pairFmRounds: Int,
    extendMinK: Int,
    extendCExt: Long
)

object Preset {
  val Default: Preset = Preset("default", 5, 3, 3, 2, DistExtend.MinExtendK, DistExtend.CExt)
  val Fast: Preset = Preset("fast", 3, 0, 0, 0, DistExtend.MinExtendK, DistExtend.CExt)
  val LargeK: Preset = Preset("largek", 5, 2, 3, 1, 16, 128L)

  def byName(name: String): Preset = name match {
    case "default" => Default
    case "fast" => Fast
    case "largek" => LargeK
    case other => throw new IllegalArgumentException(
      s"unknown preset '$other' (available: default, fast, largek)")
  }
}
