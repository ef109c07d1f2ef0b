package graft.core

/** Adaptive micro-batch sizing — the low-gain controller that floats
  * batch bounds between 8k–64k rows / 1–32 MiB, with every decision
  * recorded so replays use the recordings instead of re-adapting
  * (cdf: crates/cdf-engine/src/segmentation.rs:887-920 controller,
  * `VISION.md:362-364` "recorded sizes, replay uses recordings").
  *
  * Pure and deterministic: `next` is a function of (state, observation,
  * target) only — no clocks, no RNG. Low gain (25% step toward the
  * proportional correction, correction itself clamped to ±2×) keeps
  * the controller stable under noisy per-batch timings: a single slow
  * batch moves the size at most 25% · 50% = 12.5%, so oscillation
  * damps instead of amplifying.
  *
  * Spark mapping: the chosen bounds feed `maxRecordsPerBatch` /
  * `maxBytesPerTrigger`-shaped knobs on the micro-batch reader, and the
  * recording is persisted beside the package like `Segmentation`'s.
  */
object MicroBatch {

  final case class Bounds(
      minRows: Long = 8L * 1024,
      maxRows: Long = 64L * 1024,
      minBytes: Long = 1L << 20,
      maxBytes: Long = 32L << 20)

  final case class Size(rows: Long, bytes: Long) {
    def clamped(b: Bounds): Size = Size(
      math.max(b.minRows, math.min(b.maxRows, rows)),
      math.max(b.minBytes, math.min(b.maxBytes, bytes)))
  }

  object Size { def initial(b: Bounds): Size = Size(b.minRows, b.minBytes).clamped(b) }

  /** One observed batch: how big it was and how long it took. */
  final case class Observation(size: Size, elapsedMs: Double)

  final val Gain = 0.25
  final val MaxCorrection = 2.0
  final val MinCorrection = 0.5

  /** Low-gain proportional step toward the size that would have hit
    * `targetMs`. Non-positive observations leave the size unchanged
    * (conservative: never adapt on garbage). */
  def next(current: Size, obs: Observation, targetMs: Double, bounds: Bounds = Bounds()): Size = {
    if (obs.elapsedMs <= 0 || targetMs <= 0 || obs.size.rows <= 0) return current.clamped(bounds)
    val correction = math.max(MinCorrection, math.min(MaxCorrection, targetMs / obs.elapsedMs))
    val factor = 1.0 + Gain * (correction - 1.0)
    Size((current.rows * factor).toLong, (current.bytes * factor).toLong).clamped(bounds)
  }

  /** A controller run: fold observations, recording each decision. */
  final case class Recording(sizes: Seq[Size]) {
    def render: String = CanonicalJson.render(CanonicalJson.JArr(sizes.map(s =>
      CanonicalJson.JObj.of(
        "rows" -> CanonicalJson.JInt(s.rows),
        "bytes" -> CanonicalJson.JInt(s.bytes)))))
  }

  object Recording {
    def parse(s: String): Recording = CanonicalJson.parse(s) match {
      case CanonicalJson.JArr(vs) => Recording(vs.map { v =>
        val f = CanonicalJson.objFields(v)
        def l(k: String) = f(k).asInstanceOf[CanonicalJson.JInt].v
        Size(l("rows"), l("bytes"))
      })
      case other => throw new IllegalArgumentException(s"bad recording: $other")
    }
  }

  /** Drive a sequence of batches through the controller, producing the
    * per-batch sizes used plus the recording for replay. `observe` maps
    * a planned size to its measured elapsed time. */
  def run(nBatches: Int, targetMs: Double, observe: Size => Double,
      bounds: Bounds = Bounds()): Recording = {
    var size = Size.initial(bounds)
    val out = Vector.newBuilder[Size]
    var i = 0
    while (i < nBatches) {
      out += size
      size = next(size, Observation(size, observe(size)), targetMs, bounds)
      i += 1
    }
    Recording(out.result())
  }
}
