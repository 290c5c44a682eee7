package graft.cli

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** CLI surface (reference: cli/main.py + cli/query.py): list the query
  * registry, run a query with text/JSON output, or print its optimized
  * physical plan.
  *
  * Usage:
  *   graft.cli.Main list
  *   graft.cli.Main run <query> <sfDir> [--json] [--limit N]
  *   graft.cli.Main explain <query> <sfDir>
  */
object Main {
  private def session(): SparkSession = graft.Sessions.local("graft-cli")

  def main(args: Array[String]): Unit = args.toList match {
    case "list" :: Nil =>
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)

    case "run" :: name :: sfDir :: rest =>
      SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"unknown query: $name (try 'list')"); sys.exit(2)
        case Some(fn) =>
          val spark = session()
          val limit = rest.sliding(2).collectFirst {
            case Seq("--limit", n) => n.toInt
          }.getOrElse(20)
          val df = fn(spark, sfDir)
          if (rest.contains("--json"))
            df.limit(limit).toJSON.collect().foreach(println)
          else df.show(limit, truncate = false)
          spark.stop()
      }

    case "explain" :: name :: sfDir :: Nil =>
      SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"unknown query: $name (try 'list')"); sys.exit(2)
        case Some(fn) =>
          val spark = session()
          fn(spark, sfDir).explain("formatted")
          spark.stop()
      }

    case _ =>
      System.err.println(
        "usage: list | run <query> <sfDir> [--json] [--limit N] | explain <query> <sfDir>")
      sys.exit(2)
  }
}
