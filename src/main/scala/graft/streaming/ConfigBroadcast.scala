package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Live hyperparameter reload (reference: `system.config.updates.v1` →
 * Flink Broadcast State → operators see new thresholds without restart,
 * arch doc:2228-2237; SURVEY §2.6 T14).
 *
 * Spark's micro-batch model makes this simpler than Flink's broadcast
 * stream: configuration is re-read ON THE DRIVER at every micro-batch
 * boundary and captured by the batch's plan — every executor sees one
 * consistent snapshot per batch, the same guarantee Flink's broadcast
 * state provides per element. The store here is a properties file
 * (stand-in for the config topic/DB — swap `load` to taste).
 */
object ConfigBroadcast {

  final case class Config(values: Map[String, String]) {
    def double(key: String, default: Double): Double =
      values.get(key).map(_.toDouble).getOrElse(default)
  }

  /** Parse `k=v` lines; missing file = empty config (defaults apply). */
  def load(path: String): Config = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Config(Map.empty)
    else Config(
      Files.readAllLines(p).toArray(Array.empty[String])
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ => None
          }
        }.toMap)
  }

  /** foreachBatch sink whose transform receives the config re-read at
    * each micro-batch boundary — operators keyed off it (thresholds,
    * subscribed sets, …) follow file edits with one-batch latency. */
  def withLiveConfig(stream: DataFrame, configPath: String)(
      transform: (DataFrame, Config) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      transform(batch, load(configPath))
    }
}
