package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Audio constellation fingerprints — the peak-pair combinatorial
 * hashing of Wang 2003 (the public Shazam construction: spectrogram →
 * local peaks → (f1, f2, Δt) landmark hashes → shared-hash counting),
 * re-expressed so every step after the codec is EXACT integer
 * arithmetic an SQL engine can replay from raw samples:
 *
 *  - frames of `frameLen` samples (trailing partial frame dropped);
 *  - per frame, a SQUARE-WAVE filter bank instead of an FFT: bin k's
 *    response = Σ_i s(i)·w_k(i) with w_k(i) = 1 − 2·((i/(k+1)) % 2) —
 *    integer correlation against half-period-(k+1) square waves (the
 *    Walsh-function idea), because a float FFT would never replay
 *    bit-for-bit across engines;
 *  - the frame's PEAK is the bin with the largest |response|, ties to
 *    the lowest bin — a pure integer argmax;
 *  - landmarks pair each frame's peak with the next `fanout` frames'
 *    peaks: fp = peak_t · (bins·fanout) + peak_{t+d} · fanout + (d−1)
 *    — time-translation-invariant, like the original;
 *  - near-dups count SHARED DISTINCT fingerprints per candidate pair,
 *    where candidates come from the inverted fp→doc join (Shazam's
 *    index probe; never an all-pairs product).
 *
 * 100 TB shape: fingerprinting is one narrow map (payload in, small
 * int rows out — the payload never survives the projection); the pair
 * stage shuffles (fp)-keyed buckets whose sizes the fingerprint
 * entropy bounds, then aggregates (id_a, id_b) counts — both
 * decomposable. The codec partition is payload-bound
 * (`spark.sql.files.maxPartitionBytes` sizes decode tasks).
 */
object AudioDedup {

  /** Square-wave filter-bank constellation of one PCM sample array:
    * (frame, peak bin) pairs — exact integer replay of the docblock
    * formulas. */
  def constellation(
      samples: Array[Int], frameLen: Int, bins: Int): Array[(Int, Int)] = {
    require(frameLen >= 2 * bins, "frameLen must cover the largest half-period twice")
    val nFrames = samples.length / frameLen
    val out = new Array[(Int, Int)](nFrames)
    var t = 0
    while (t < nFrames) {
      var bestMag = -1L
      var best = 0
      var k = 0
      while (k < bins) {
        val h = k + 1
        var corr = 0L
        var i = 0
        while (i < frameLen) {
          val w = 1 - 2 * ((i / h) % 2)
          corr += samples(t * frameLen + i).toLong * w
          i += 1
        }
        val mag = math.abs(corr)
        if (mag > bestMag) { bestMag = mag; best = k }
        k += 1
      }
      out(t) = (t, best)
      t += 1
    }
    out
  }

  /**
   * Per-payload landmark fingerprints: (idCol, t, fp) — one row per
   * (anchor frame, fanout offset), undecodable payloads drop (the
   * per-row corrupt-blob contract of [[Multimodal.pcmSamples]]).
   */
  def fingerprints(
      media: DataFrame,
      idCol: String,
      payloadCol: String,
      frameLen: Int = 32,
      bins: Int = 8,
      fanout: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        Multimodal.pcmSamples(payload).toSeq.flatMap { samples =>
          val peaks = constellation(samples, frameLen, bins)
          for {
            (t, p1) <- peaks
            d <- 1 to fanout
            if t + d < peaks.length
          } yield (id, t.toLong,
            (p1 * bins * fanout + peaks(t + d)._2 * fanout + (d - 1)).toLong)
        }
      }
      .toDF(idCol, "t", "fp")
  }

  /**
   * Shared-landmark near-dup pairs: candidates from the inverted
   * fp→doc join over DISTINCT per-doc fingerprints, kept when they
   * share at least `minShared`. Output (id_a, id_b, n_shared),
   * id_a < id_b.
   */
  def sharedFingerprintPairs(
      fps: DataFrame, idCol: String, minShared: Long): DataFrame = {
    val d = fps.select(col(idCol), col("fp")).distinct()
    val a = d.select(col(idCol).as("id_a"), col("fp"))
    val b = d.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
