package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Closed-form rank-derived functions for the two-pass global ranking
  * (see q_window_ntile): given the global 1-based row number `rn` and the
  * total count `n`, each is a per-row expression — no global window.
  */
object RankMath {

  /** SQL NTILE(k): the n mod k remainder rows go to the FIRST buckets,
    * so bucket sizes are ceil(n/k) for the first (n mod k) buckets and
    * floor(n/k) for the rest — NOT the uniform floor((rn-1)·k/n)+1, which
    * spreads remainder rows differently whenever 1 < n mod k < k. */
  def ntile(rn: Column, n: Long, k: Long): Column = {
    require(n > 0 && k > 0, s"ntile needs n>0, k>0 (got n=$n, k=$k)")
    val bigSize = (n + k - 1) / k
    val nBig = n % k
    val cut = nBig * bigSize
    val smallSize = n / k
    if (nBig == 0) (rn - 1) * k / n + 1
    else when(rn <= cut, (rn - 1) / bigSize + 1)
      .otherwise(lit(nBig) + (rn - cut - 1) / smallSize + 1)
  }
}
