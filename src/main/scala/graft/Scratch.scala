package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe harness. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tickets = spark.read.json(Seq(
      """{"id":"t1","number":101,"summary":"s","tags":["vip"],
          "createdAt":"2024-01-01T10:00:00-0300","updatedAt":"2024-01-02T10:00:00-0300",
          "status":{"name":"Aberto"},"channel":{"name":"chat"},
          "requester":{"name":"Ana","email":"a@x.com"},"group":{"id":"g7"},
          "lastHumanInteraction":{"propertiesChanges":{"status":"w"}},
          "customField":[{"key":"cpf","value":"123"}]}""").toDS())
    val chats = spark.read.json(Seq(
      """{"chat_id":"c9","number":900,"evt_ticket_ticketNumber":"101","status":"closed"}""").toDS())
    val dest = Seq(("u", "999")).toDF("uuid", "n_ticket")

    val out = Pipeline.run(tickets, chats, dest, uuidGen = lit("gen"))
    println("PROBE columns: " + out.columns.mkString(", "))
    out.select("n_ticket", "uuid", "status", "status_ticket", "ticket_cpf", "channel_ticket").show()
    out.explain("formatted")
    spark.stop()
  }
}
